"""Streaming near-duplicate ingest: LSH dedup against an incremental
signature store (SURVEY.md B22 × B27).

The production shape for continuous corpus ingestion: documents arrive
as a stream; each micro-batch computes MinHash signatures for its new
documents, probes them against the banded signatures of everything
ingested BEFORE, and flags near-duplicates — the non-duplicates (and the
duplicates: they can themselves be the earliest match of later arrivals)
append to the store. Per-batch work is O(batch × colliding buckets),
never O(corpus²).

Batch-split invariance (pytest-pinned): a document is flagged iff some
*earlier* document (previous batch, or same batch with a smaller id)
collides on a full band with signature agreement ≥ the threshold. That
predicate does not mention batch boundaries, so any split of the feed —
one batch, three batches, one file per document — yields identical
flags, and the single-batch run equals the flags derived from the batch
operator ``minhash_lsh_pairs``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hive_plan_service_spark.operators.dedup import (
    banded_signatures,
    minhash_signatures,
)
from hive_plan_service_spark.session import tune

#: File schema of the documents parquet (TESTDATA.md).
DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


class StreamingDedupIngest:
    """Maintains ``<workdir>/sig_store`` (banded signatures of every doc
    seen) and ``<workdir>/flags`` (doc_id, is_dup) parquet."""

    def __init__(
        self,
        spark: SparkSession,
        docs_path: str,
        workdir: str,
        *,
        num_hashes: int = 16,
        bands: int = 4,
        est_threshold: float = 0.5,
    ):
        self.spark = spark
        self.docs_path = docs_path
        self.store = os.path.join(workdir, "sig_store")
        self.flags = os.path.join(workdir, "flags")
        self.ckpt = os.path.join(workdir, "ckpt_ingest")
        self.num_hashes = num_hashes
        self.bands = bands
        self.est_threshold = est_threshold

    def _est(self) -> F.Column:
        agree = F.size(
            F.filter(
                F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda x, y: x == y),
                lambda eq: eq,
            )
        )
        return agree / F.lit(float(self.num_hashes))

    def _ingest(self, batch_df: DataFrame, epoch_id: int) -> None:
        banded = banded_signatures(
            minhash_signatures(batch_df, num_hashes=self.num_hashes),
            num_hashes=self.num_hashes,
            bands=self.bands,
        )
        # the same banded subtree feeds three joins — materialize once,
        # not three plan copies (each re-runs signature aggregation)
        banded = banded.localCheckpoint(eager=True)

        new = banded.select(
            F.col("doc_id_").alias("doc_b"),
            F.col("sig").alias("sig_b"),
            "band",
            "bucket",
        )
        # earlier docs: everything in the store (previous batches) …
        earlier_sides = []
        if os.path.isdir(self.store):
            earlier_sides.append(self.spark.read.parquet(self.store))
        # … plus same-batch docs with a smaller id (the batch twin's
        # doc_a < doc_b orientation)
        earlier_sides.append(
            banded.select(
                F.col("doc_id_").alias("doc_a"),
                F.col("sig").alias("sig_a"),
                "band",
                "bucket",
            )
        )
        earlier = earlier_sides[0]
        for side in earlier_sides[1:]:
            earlier = earlier.unionByName(side)

        dup_ids = (
            new.join(earlier, ["band", "bucket"])
            .filter(F.col("doc_a") < F.col("doc_b"))
            .filter(self._est() >= self.est_threshold)
            .select(F.col("doc_b").alias("doc_id"))
            .distinct()
        )
        flags = (
            batch_df.select("doc_id")
            .join(dup_ids.withColumn("is_dup", F.lit(True)), "doc_id", "left")
            .select("doc_id", F.coalesce("is_dup", F.lit(False)).alias("is_dup"))
        )
        flags.write.mode("append").parquet(self.flags)
        # duplicates append too: they are legitimate earliest-matches for
        # later arrivals (and this is what makes flags split-invariant)
        banded.select(
            F.col("doc_id_").alias("doc_a"),
            F.col("sig").alias("sig_a"),
            "band",
            "bucket",
        ).write.mode("append").parquet(self.store)

    def run(self, max_files_per_trigger: int | None = None) -> DataFrame:
        """Ingest everything pending; return the (doc_id, is_dup) flags."""
        tune(self.spark)
        reader = self.spark.readStream.schema(DOCS_SCHEMA)
        if max_files_per_trigger is not None:
            reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
        path = self.docs_path
        if os.path.isfile(path):
            reader = reader.option("pathGlobFilter", os.path.basename(path))
            path = os.path.dirname(path)
        q = (
            reader.parquet(path)
            .writeStream.foreachBatch(self._ingest)
            .option("checkpointLocation", self.ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return self.spark.read.parquet(self.flags)
