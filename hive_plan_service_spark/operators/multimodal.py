"""Multimodal columns (SURVEY.md B30): binary payloads + typed metadata.

Images/audio/video are opaque ``BinaryType`` columns with a
``StructType`` metadata sibling; decode / feature-extract / resize /
frame-sample run as Arrow-batched ``mapInPandas`` stages. The actual
codec work is STUBBED (no image/audio libraries in this container) with
a clearly-marked deterministic fake — the Spark-side plumbing (schema,
batch iteration, binary transfer, partitioning) is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Output schema of the decode stage.
DECODE_SCHEMA = (
    "doc_id bigint, n_bytes bigint, byte_sum bigint, "
    "width int, height int, mime string"
)


def attach_binary_payload(docs: DataFrame) -> DataFrame:
    """Simulate a multimodal table: text → UTF-8 binary payload + metadata.

    Real pipelines read payloads from parquet/object storage; the struct
    metadata (mime, fake dimensions) travels next to the bytes.
    """
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            F.lit("image/png").alias("mime"),
            (F.pmod(F.col("doc_id"), F.lit(1024)) + 16).cast("int").alias("width"),
            (F.pmod(F.col("doc_id") * 7, F.lit(768)) + 16).cast("int").alias("height"),
        ).alias("meta"),
    )


def decode_features(multimodal: DataFrame) -> DataFrame:
    """'Decode' payloads per Arrow batch and emit scalar features.

    STUB decode: a real implementation would e.g. ``PIL.Image.open`` the
    bytes here; the container has no codec libs, so the feature is a
    deterministic byte-sum. Everything around it — batched binary
    columns through Arrow, pandas iteration, typed output schema — is
    the production shape.
    """

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    # deterministic fake for the codec call:
                    "byte_sum": payloads.map(lambda b: int(sum(b))).astype("int64"),
                    "width": pdf["meta"].map(lambda m: m["width"]).astype("int32"),
                    "height": pdf["meta"].map(lambda m: m["height"]).astype("int32"),
                    "mime": pdf["meta"].map(lambda m: m["mime"]),
                }
            )

    return multimodal.mapInPandas(_decode, schema=DECODE_SCHEMA)
