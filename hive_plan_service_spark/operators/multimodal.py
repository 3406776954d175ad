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
            # nullable Int64 for the payload-derived features: a NULL
            # payload (NULL source text) yields NULL bytes/sum like the
            # oracle's length(NULL), instead of crashing len(None) —
            # the NULL-documents sweep found exactly that (§13); the
            # meta-derived fields stay non-null (built from doc_id)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.map(
                        lambda b: len(b) if b is not None else None
                    ).astype("Int64"),
                    # deterministic fake for the codec call:
                    "byte_sum": payloads.map(
                        lambda b: int(sum(b)) if b is not None else None
                    ).astype("Int64"),
                    "width": pdf["meta"].map(lambda m: m["width"]).astype("int32"),
                    "height": pdf["meta"].map(lambda m: m["height"]).astype("int32"),
                    "mime": pdf["meta"].map(lambda m: m["mime"]),
                }
            )

    return multimodal.mapInPandas(_decode, schema=DECODE_SCHEMA)


RESIZE_SCHEMA = (
    "doc_id bigint, width int, height int, new_width int, new_height int, "
    "n_bytes bigint, n_bytes_after bigint"
)


def resize_payloads(multimodal: DataFrame, max_dim: int = 64) -> DataFrame:
    """'Resize' payloads so the longest side fits ``max_dim`` (1→1 stage).

    STUB codec: a real implementation would decode, ``Image.resize``,
    re-encode. The stub applies the exact arithmetic a resizer implies —
    scale = min(1, max_dim / max(w, h)), new dims = floor(dim · scale),
    payload truncated to floor(n_bytes · scale²) — all IEEE double ops
    that a SQL oracle reproduces bit-for-bit, so unlike the other stubs
    this stage is fully oracle-checkable. Upscaling never happens
    (scale clamps at 1), matching resize-to-fit semantics.
    """

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                "doc_id": [], "width": [], "height": [], "new_width": [],
                "new_height": [], "n_bytes": [], "n_bytes_after": [],
            }
            for doc_id, payload, meta in zip(
                pdf["doc_id"], pdf["payload"], pdf["meta"]
            ):
                w, h = int(meta["width"]), int(meta["height"])
                scale = min(1.0, max_dim / max(w, h))
                rows["doc_id"].append(doc_id)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["new_width"].append(int(w * scale))
                rows["new_height"].append(int(h * scale))
                if payload is None:
                    # NULL payload: dims still resize (meta-derived),
                    # byte counts are NULL like the oracle's
                    # length(NULL) arithmetic (NULL-docs sweep, §13)
                    rows["n_bytes"].append(None)
                    rows["n_bytes_after"].append(None)
                else:
                    resized = payload[: int(len(payload) * scale * scale)]
                    rows["n_bytes"].append(len(payload))
                    rows["n_bytes_after"].append(len(resized))
            yield pd.DataFrame(rows).astype(
                {
                    "doc_id": "int64", "width": "int32", "height": "int32",
                    "new_width": "int32", "new_height": "int32",
                    "n_bytes": "Int64", "n_bytes_after": "Int64",
                }
            )

    return multimodal.mapInPandas(_resize, schema=RESIZE_SCHEMA)


FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame_bytes int, frame_hash bigint"


def sample_frames(multimodal: DataFrame, stride: int = 64, frame: int = 8) -> DataFrame:
    """Frame-sample payloads: one output row per sampled byte-window.

    The 1→N shape of a video frame sampler (decode → every k-th frame →
    per-frame features) with the codec STUBBED: a "frame" is an 8-byte
    window every ``stride`` bytes, its "feature" a rolling hash. Real
    Arrow plumbing: batch iteration, row explosion, typed output.
    """

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame_bytes": [], "frame_hash": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:  # NULL payload: zero frames; the
                    continue  # consumer decides NULL-vs-0 (§13)
                for idx, off in enumerate(range(0, len(payload), stride)):
                    window = payload[off : off + frame]
                    h = 0
                    for b in window:
                        h = (h * 31 + b) % 2_147_483_647
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(idx)
                    out["frame_bytes"].append(len(window))
                    out["frame_hash"].append(h)
            yield pd.DataFrame(out)

    return multimodal.mapInPandas(_sample, schema=FRAME_SCHEMA)
