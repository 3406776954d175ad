"""ANN scaling probe: brute-force cosine top-k vs IVF vs hyperplane LSH.

Inflates the embeddings table N× (one scan: crossJoin with a range, ids
shifted, each copy's vector deterministically perturbed by ±0.05 so
copies are distinct points rather than exact duplicates — identical
copies make top-k a tie-break artifact), materializes the corpus to
scratch parquet, and times the similarity-search paths for a fixed
query batch, recording recall@5 of each ANN path against the
brute-force truth. The measured basis for the engine's claim that the
bucketed paths are the corpus-scale option: brute force pays #queries ×
#corpus cosines; IVF pays the probed buckets; LSH pays bucket
collisions.

At large mult the query batch shrinks (brute-force truth is O(q·n))
and PQ codebooks train on a ≤64k-vector sample — the production
methodology (train on sample, encode all) rather than a probe shortcut.

Usage: python scripts/ann_probe.py [multipliers...]  (default 1 4 16)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from pyspark.sql import functions as F  # noqa: E402

from hive_plan_service_spark.operators import vectors as vx  # noqa: E402
from hive_plan_service_spark.session import get_spark  # noqa: E402
from hive_plan_service_spark.sources.catalog import register_tables  # noqa: E402
from hive_plan_service_spark.sources.writers import write_parquet_heap_safe  # noqa: E402


def multiplied(spark, mult: int):
    from hive_plan_service_spark.session import default_parallelism, process_scratch_dir

    base = spark.table("embeddings")
    n = base.count()
    reps = spark.range(mult).select(F.col("id").alias("_rep"))
    out = (
        base.crossJoin(reps)
        .withColumn("vec_id", F.col("vec_id") + F.col("_rep") * F.lit(n))
        .withColumn(
            "embedding",
            # deterministic per-(vector, element) jitter in [-0.05, 0.05):
            # copies stay close to the original (neighborhood structure
            # preserved) without being exact duplicates. pmod, not %:
            # Spark's % keeps the dividend's sign, which would bias
            # every element by -0.05 and double the noise width
            F.transform(
                "embedding",
                lambda x, i: (
                    x.cast("double")
                    + F.pmod(F.xxhash64(F.col("vec_id"), i), F.lit(1000)).cast(
                        "double"
                    )
                    / F.lit(10000.0)
                    - F.lit(0.05)
                ).cast("float"),
            ),
        )
        .drop("_rep")
    )
    path = os.path.join(process_scratch_dir("ann_probe"), f"corpus_{mult}")
    write_parquet_heap_safe(out.repartition(default_parallelism()), path)
    return spark.read.parquet(path), path


def topk_set(df):
    return {(r["query_id"], r["neighbor_id"]) for r in df.collect()}


def main() -> None:
    mults = [int(m) for m in sys.argv[1:]] or [1, 4, 16]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="hpss-ann-probe")
    register_tables(spark, sf_dir)
    for mult in mults:
        emb, corpus_path = multiplied(spark, mult)
        n = emb.count()
        # brute-force truth is O(q·n): shrink the batch at corpus scale
        n_q = 50 if n <= 300_000 else 10
        queries = emb.filter(F.col("vec_id") < n_q)

        t0 = time.perf_counter()
        truth = topk_set(vx.cosine_topk(queries, emb, k=5))
        t_brute = time.perf_counter() - t0

        # K must be fixed (or ~sqrt(n)), never proportional to n: the
        # assignment step is O(n x K) cosines, so n-proportional seeding
        # (e.g. vec_id % 97, fine at fixture scale) degrades to O(n^2/97)
        # - measured 115 s at 128k vectors before this fix
        k_centroids = 64
        cents = emb.filter(
            F.col("vec_id") % F.lit(max(1, n // k_centroids)) == 0
        ).select(F.col("vec_id").alias("centroid_id"), "embedding")
        # index build (one-time, amortized over every later query batch)
        t0 = time.perf_counter()
        assigned = vx.ivf_assign(emb, cents).localCheckpoint(eager=True)
        t_index = time.perf_counter() - t0
        t0 = time.perf_counter()
        nprobe = int(os.environ.get("ANN_PROBE_IVF_NPROBE", "2"))
        ivf = topk_set(
            vx.ivf_topk(queries, assigned, cents, k=5, nprobe=nprobe)
        )
        t_ivf_q = time.perf_counter() - t0

        t0 = time.perf_counter()
        lsh = topk_set(vx.lsh_topk(queries, emb, k=5))
        t_lsh = time.perf_counter() - t0

        # PQ path works on unit vectors so squared-L2 order == cosine order
        nrm = F.sqrt(
            F.aggregate(
                F.transform(
                    "embedding", lambda x: x.cast("double") * x.cast("double")
                ),
                F.lit(0.0),
                lambda a, v: a + v,
            )
        )
        unit = emb.select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double") / nrm).alias(
                "embedding"
            ),
        )
        uq = unit.filter(F.col("vec_id") < n_q)
        t0 = time.perf_counter()
        # train on a bounded sample at corpus scale (production
        # methodology: codebooks from a sample, encode everything)
        train_src = unit.filter(F.col("vec_id") < 65536) if n > 100_000 else unit
        books = vx.pq_train_codebooks(train_src, subspaces=8, codes=64)
        # index artifact = the WIDE codes (one row per vector): the
        # narrow->wide pivot shuffles n·S rows and belongs at build time
        pq_codes = vx.pq_codes_wide(
            vx.pq_encode(unit, books, subspaces=8)
        ).localCheckpoint(eager=True)
        t_pq_index = time.perf_counter() - t0
        shortlist = int(os.environ.get("ANN_PROBE_PQ_SHORTLIST", "50"))
        t0 = time.perf_counter()
        pq = topk_set(
            vx.pq_topk_refined(
                uq, pq_codes, books, unit, k=5, subspaces=8,
                shortlist=shortlist,
            )
        )
        t_pq_q = time.perf_counter() - t0

        print(
            json.dumps(
                {
                    "mult": mult,
                    "n_vectors": n,
                    "n_queries": n_q,
                    "brute_sec": round(t_brute, 2),
                    "ivf_index_sec": round(t_index, 2),
                    "ivf_query_sec": round(t_ivf_q, 2),
                    "ivf_recall": round(len(truth & ivf) / len(truth), 3),
                    "ivf_nprobe": nprobe,
                    "lsh_sec": round(t_lsh, 2),
                    "lsh_recall": round(len(truth & lsh) / len(truth), 3),
                    "pq_index_sec": round(t_pq_index, 2),
                    "pq_query_sec": round(t_pq_q, 2),
                    "pq_recall": round(len(truth & pq) / len(truth), 3),
                    "pq_shortlist": shortlist,
                }
            )
        )
        # corpora live on tmpfs scratch (RAM): reclaim each multiplier's
        # directory before building the next one
        shutil.rmtree(corpus_path, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
