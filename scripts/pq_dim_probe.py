"""PQ production-dim probe (VERDICT r4 #1): the one unmeasured scale
claim in the repo is that PQ-ADC's query-side win over brute force
materializes at production dims (768+), where the per-pair arithmetic
ratio is ~dim/subspaces ≈ 50-100× instead of 64/8 = 8×.

Builds a 768-dim corpus from the 64-dim fixture (invariant 23 recipe:
one crossJoin-with-range replication with per-copy jitter so copies are
DISTINCT points, materialized to scratch parquet before timing), widened
by permuted tiling + per-element jitter so (a) blocks are not identical
copies PQ could compress for free, (b) the original neighborhood
structure survives — jittered copies of one base vector stay mutual
near-neighbors at 768 dims.

Per multiplier it times, on unit-normalized vectors:
  - brute-force cosine top-5 (the exact baseline, q x n x dim madds)
  - PQ index build (sample-trained codebooks + encode + wide pivot)
  - PQ-ADC + exact re-rank query (q x n x subspaces lookups + q x
    shortlist exact), with recall@5 vs the brute truth

Usage: python scripts/pq_dim_probe.py [multipliers...]   (default 32 128)
Env: PQ_PROBE_DIM (768), PQ_PROBE_SUBSPACES (16), PQ_PROBE_CODES (64),
     PQ_PROBE_SHORTLIST (400), PQ_PROBE_SHORTLISTS (comma list — sweeps
     the query side over several shortlists against ONE trained index,
     for the recall-vs-cost knob curve at a fixed corpus),
     SPARK_GRAFT_SF_DIR.
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
from hive_plan_service_spark.session import (  # noqa: E402
    default_parallelism,
    get_spark,
    process_scratch_dir,
)
from hive_plan_service_spark.sources.catalog import register_tables  # noqa: E402
from hive_plan_service_spark.sources.writers import write_parquet_heap_safe  # noqa: E402

DIM = int(os.environ.get("PQ_PROBE_DIM", "768"))
BASE_DIM = 64
SUBSPACES = int(os.environ.get("PQ_PROBE_SUBSPACES", "16"))
CODES = int(os.environ.get("PQ_PROBE_CODES", "64"))
SHORTLIST = int(os.environ.get("PQ_PROBE_SHORTLIST", "400"))
SHORTLISTS = [
    int(s)
    for s in os.environ.get("PQ_PROBE_SHORTLISTS", str(SHORTLIST)).split(",")
]
N_QUERIES = 10

assert DIM % BASE_DIM == 0 and DIM % SUBSPACES == 0


def widened_corpus(spark, mult: int):
    """mult x replicated, DIM-wide, UNIT-normalized corpus on scratch."""
    base = spark.table("embeddings")
    n = base.count()
    reps = spark.range(mult).select(F.col("id").alias("_rep"))
    blocks = DIM // BASE_DIM
    # element i of the widened vector reads base element (i%64 + 7*(i//64))%64
    # — each 64-block is a rotated copy of the base vector, so cross-doc
    # cosine structure survives widening; the per-(vec, element) jitter
    # (pmod — Spark's % keeps the dividend sign, ROUND4_NOTES §9) makes
    # every block and every copy a distinct point.
    widened = F.transform(
        F.sequence(F.lit(0), F.lit(DIM - 1)),
        lambda i: (
            F.element_at(
                "embedding",
                ((i % BASE_DIM + 7 * F.floor(i / BASE_DIM)) % BASE_DIM + 1
                 ).cast("int"),
            ).cast("double")
            + F.pmod(F.xxhash64(F.col("vec_id"), i), F.lit(1000)).cast(
                "double"
            )
            / F.lit(10000.0)
            - F.lit(0.05)
        ),
    )
    # Spread FIRST (invariant 14): the one-file embeddings scan is
    # unsplittable, and without this the whole 768-dim synthesis ran as
    # ONE task (measured: a single 900 s-CPU straggler).
    raw = (
        base.crossJoin(reps)
        .withColumn("vec_id", F.col("vec_id") + F.col("_rep") * F.lit(n))
        .repartition(default_parallelism(), "vec_id")
        .select("vec_id", widened.alias("embedding"))
    )
    # unit-normalize ONCE at corpus-build time (what a production vector
    # store holds) so brute and PQ both read normalized parquet and the
    # squared-L2 ADC order equals cosine order
    nrm = F.sqrt(
        F.aggregate(
            F.transform("embedding", lambda x: x * x),
            F.lit(0.0),
            lambda a, v: a + v,
        )
    )
    wide = raw.select("vec_id", "embedding", nrm.alias("_nrm"))
    # exchange BETWEEN norm and divide (invariant 13): in one collapsed
    # projection, CollapseProject inlines the 768-element norm fold into
    # every element of the divide lambda — a 768x recompute per row.
    # Below the exchange _nrm is a bound column and cannot be inlined.
    unit = wide.repartition(default_parallelism(), "vec_id").select(
        "vec_id",
        F.transform(
            "embedding", lambda x: (x / F.col("_nrm")).cast("float")
        ).alias("embedding"),
    )
    path = os.path.join(process_scratch_dir("pq_dim_probe"), f"unit_{DIM}_{mult}")
    # heap-safe row groups for the wide 768-dim rows (r6 spill
    # certification: default 128 MiB x 32 writer buffers OOM a 4 GiB
    # heap before the first flush — sources/writers.py)
    write_parquet_heap_safe(unit, path)
    return spark.read.parquet(path), path


def topk_set(df):
    return {(r["query_id"], r["neighbor_id"]) for r in df.collect()}


def ivf_main(mults: list[int]) -> None:
    """IVF at production dims (--ivf): the 64-dim certification named
    IVF the corpus-scale path; this re-certifies it on the same 768-dim
    widened corpus PQ was measured on, against the same brute truth.
    Index = 64 mod-sampled centroids (tuning constant, ann_probe's
    recipe) + broadcast-argmin assign, checkpointed; query side swept
    over nprobe. IVF_PROBE_TRAINED=1 instead builds the PRODUCTION
    index entirely through the Arrow/numpy twins: integer-Lloyd k-means
    centroids trained on a 65k sample (``kmeans_integer_np``) and
    corpus assignment via ``ivf_assign_np`` — the fully twin-composed
    index path, decomposed into train/assign seconds.
    """
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    trained = os.environ.get("IVF_PROBE_TRAINED", "") == "1"
    spark = get_spark(app_name="hpss-ivf-dim-probe")
    register_tables(spark, sf_dir)
    for mult in mults:
        unit, path = widened_corpus(spark, mult)
        n = unit.count()
        queries = unit.filter(F.col("vec_id") < N_QUERIES)

        t0 = time.perf_counter()
        truth = topk_set(vx.cosine_topk(queries, unit, k=5))
        t_brute = time.perf_counter() - t0

        k_centroids = 64
        t_train = 0.0
        t0 = time.perf_counter()
        if trained:
            from hive_plan_service_spark.operators.kmeans import (
                kmeans_integer_np,
            )

            sample = (
                unit.filter(F.col("vec_id") < 65536) if n > 100_000 else unit
            )
            cents = kmeans_integer_np(
                sample, k=k_centroids, dim=DIM, iters=5,
                vec="embedding", id_col="vec_id",
            ).select(
                F.col("code").cast("bigint").alias("centroid_id"),
                F.col("centroid").cast("array<float>").alias("embedding"),
            ).localCheckpoint(eager=True)
            t_train = time.perf_counter() - t0
            t0 = time.perf_counter()
            assigned = vx.ivf_assign_np(unit, cents).localCheckpoint(
                eager=True
            )
        else:
            cents = unit.filter(
                F.col("vec_id") % F.lit(max(1, n // k_centroids)) == 0
            ).select(F.col("vec_id").alias("centroid_id"), "embedding")
            assigned = vx.ivf_assign(unit, cents).localCheckpoint(eager=True)
        t_index = time.perf_counter() - t0

        for nprobe in (4, 8, 16):
            t0 = time.perf_counter()
            ivf = topk_set(
                vx.ivf_topk(queries, assigned, cents, k=5, nprobe=nprobe)
            )
            t_q = time.perf_counter() - t0
            print(
                json.dumps(
                    {
                        "dim": DIM,
                        "mult": mult,
                        "n_vectors": n,
                        "n_queries": N_QUERIES,
                        "k_centroids": k_centroids,
                        "trained": trained,
                        "nprobe": nprobe,
                        "brute_sec": round(t_brute, 2),
                        "ivf_train_sec": round(t_train, 2),
                        "ivf_index_sec": round(t_index, 2),
                        "ivf_query_sec": round(t_q, 2),
                        "ivf_recall": round(len(truth & ivf) / len(truth), 3),
                    }
                ),
                flush=True,
            )
        shutil.rmtree(path, ignore_errors=True)
    spark.stop()


def encode_main(mults: list[int]) -> None:
    """Encode-path A/B (--encode): Column-algebra ``pq_encode`` (the
    oracle-grade registered path) vs the ``pq_encode_np`` Arrow/numpy
    throughput twin, same trained codebooks, both MATERIALIZED via eager
    localCheckpoint (ROUND5_NOTES §5: a bare .count() lets Catalyst
    prune the argmin aggregate and times a plan that never computes the
    codes). Output equality is asserted per run — the twin is
    bit-identical by fold-order construction, re-proven at probe scale.
    """
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="hpss-pq-encode-probe")
    register_tables(spark, sf_dir)
    for mult in mults:
        unit, path = widened_corpus(spark, mult)
        n = unit.count()
        train_src = (
            unit.filter(F.col("vec_id") < 65536) if n > 100_000 else unit
        )
        books = vx.pq_train_codebooks(
            train_src, subspaces=SUBSPACES, codes=CODES, dim=DIM
        ).localCheckpoint(eager=True)

        t0 = time.perf_counter()
        col_codes = vx.pq_encode(
            unit, books, subspaces=SUBSPACES, dim=DIM
        ).localCheckpoint(eager=True)
        t_col = time.perf_counter() - t0

        t0 = time.perf_counter()
        np_codes = vx.pq_encode_np(
            unit, books, subspaces=SUBSPACES, dim=DIM
        ).localCheckpoint(eager=True)
        t_np = time.perf_counter() - t0

        mismatch = (
            col_codes.exceptAll(np_codes).count()
            + np_codes.exceptAll(col_codes).count()
        )
        print(
            json.dumps(
                {
                    "dim": DIM,
                    "mult": mult,
                    "n_vectors": n,
                    "subspaces": SUBSPACES,
                    "codes": CODES,
                    "encode_column_sec": round(t_col, 2),
                    "encode_np_sec": round(t_np, 2),
                    "speedup": round(t_col / t_np, 1),
                    "mismatched_rows": mismatch,
                }
            ),
            flush=True,
        )
        shutil.rmtree(path, ignore_errors=True)
    spark.stop()


def train_main(mults: list[int]) -> None:
    """Training-path A/B (--train): Column-algebra ``pq_train_codebooks``
    (the oracle-grade registered path) vs ``pq_train_codebooks_np`` (the
    Arrow/numpy Lloyd twin) on the SAME 65k-capped training sample the
    index build uses — ROUND5_NOTES §5 decomposed the 1M-build into
    ~140 s corpus-independent training + encode, and the encode twin
    already removed the second term. Codebook equality is asserted per
    run (integer sums commute — bit-identical is the contract, not a
    tolerance).
    """
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="hpss-pq-train-probe")
    register_tables(spark, sf_dir)
    for mult in mults:
        unit, path = widened_corpus(spark, mult)
        n = unit.count()
        train_src = (
            unit.filter(F.col("vec_id") < 65536) if n > 100_000 else unit
        )
        n_train = train_src.count()

        t0 = time.perf_counter()
        col_books = vx.pq_train_codebooks(
            train_src, subspaces=SUBSPACES, codes=CODES, dim=DIM
        ).localCheckpoint(eager=True)
        t_col = time.perf_counter() - t0

        t0 = time.perf_counter()
        np_books = vx.pq_train_codebooks_np(
            train_src, subspaces=SUBSPACES, codes=CODES, dim=DIM
        ).localCheckpoint(eager=True)
        t_np = time.perf_counter() - t0

        mismatch = (
            col_books.exceptAll(np_books).count()
            + np_books.exceptAll(col_books).count()
        )
        print(
            json.dumps(
                {
                    "dim": DIM,
                    "mult": mult,
                    "n_vectors": n,
                    "n_train": n_train,
                    "subspaces": SUBSPACES,
                    "codes": CODES,
                    "train_column_sec": round(t_col, 2),
                    "train_np_sec": round(t_np, 2),
                    "speedup": round(t_col / t_np, 1),
                    "mismatched_rows": mismatch,
                }
            ),
            flush=True,
        )
        shutil.rmtree(path, ignore_errors=True)
    spark.stop()


def assign_main(mults: list[int]) -> None:
    """IVF assignment A/B (--assign): Column ``ivf_assign`` (oracle
    path) vs ``ivf_assign_np`` (Arrow/numpy twin) on the widened corpus
    — the corpus-proportional part of the IVF index build. Both sides
    materialized via eager localCheckpoint; the (id → centroid) maps
    are compared exactly per run.
    """
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="hpss-ivf-assign-probe")
    register_tables(spark, sf_dir)
    for mult in mults:
        unit, path = widened_corpus(spark, mult)
        n = unit.count()
        k_centroids = 64
        cents = unit.filter(
            F.col("vec_id") % F.lit(max(1, n // k_centroids)) == 0
        ).select(F.col("vec_id").alias("centroid_id"), "embedding")

        t0 = time.perf_counter()
        col = (
            vx.ivf_assign(unit, cents)
            .select("vec_id", "centroid_id")
            .localCheckpoint(eager=True)
        )
        t_col = time.perf_counter() - t0

        t0 = time.perf_counter()
        np_ = (
            vx.ivf_assign_np(unit, cents)
            .select("vec_id", "centroid_id")
            .localCheckpoint(eager=True)
        )
        t_np = time.perf_counter() - t0

        mismatch = (
            col.exceptAll(np_).count() + np_.exceptAll(col).count()
        )
        print(
            json.dumps(
                {
                    "dim": DIM,
                    "mult": mult,
                    "n_vectors": n,
                    "k_centroids": k_centroids,
                    "assign_column_sec": round(t_col, 2),
                    "assign_np_sec": round(t_np, 2),
                    "speedup": round(t_col / t_np, 1),
                    "mismatched_rows": mismatch,
                }
            ),
            flush=True,
        )
        shutil.rmtree(path, ignore_errors=True)
    spark.stop()


def brute_main(mults: list[int]) -> None:
    """Exact-search A/B (--brute): Column ``cosine_topk`` (the
    canonical/truth path) vs ``cosine_topk_np`` (Arrow/numpy twin) on
    the widened corpus; the (query, neighbor, cos, rank) sets are
    compared exactly per run.
    """
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="hpss-brute-probe")
    register_tables(spark, sf_dir)
    for mult in mults:
        unit, path = widened_corpus(spark, mult)
        n = unit.count()
        queries = unit.filter(F.col("vec_id") < N_QUERIES)

        t0 = time.perf_counter()
        col = vx.cosine_topk(queries, unit, k=5).localCheckpoint(eager=True)
        t_col = time.perf_counter() - t0

        t0 = time.perf_counter()
        np_ = vx.cosine_topk_np(queries, unit, k=5).localCheckpoint(
            eager=True
        )
        t_np = time.perf_counter() - t0

        mismatch = col.exceptAll(np_).count() + np_.exceptAll(col).count()
        print(
            json.dumps(
                {
                    "dim": DIM,
                    "mult": mult,
                    "n_vectors": n,
                    "n_queries": N_QUERIES,
                    "brute_column_sec": round(t_col, 2),
                    "brute_np_sec": round(t_np, 2),
                    "speedup": round(t_col / t_np, 1),
                    "mismatched_rows": mismatch,
                }
            ),
            flush=True,
        )
        shutil.rmtree(path, ignore_errors=True)
    spark.stop()


def main() -> None:
    args = sys.argv[1:]
    if "--brute" in args:
        args.remove("--brute")
        brute_main([int(m) for m in args] or [128])
        return
    if "--assign" in args:
        args.remove("--assign")
        assign_main([int(m) for m in args] or [128])
        return
    if "--ivf" in args:
        args.remove("--ivf")
        ivf_main([int(m) for m in args] or [128, 512])
        return
    if "--encode" in args:
        args.remove("--encode")
        encode_main([int(m) for m in args] or [128])
        return
    if "--train" in args:
        args.remove("--train")
        train_main([int(m) for m in args] or [128])
        return
    mults = [int(m) for m in args] or [32, 128]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="hpss-pq-dim-probe")
    register_tables(spark, sf_dir)
    for mult in mults:
        unit, path = widened_corpus(spark, mult)
        n = unit.count()
        queries = unit.filter(F.col("vec_id") < N_QUERIES)

        t0 = time.perf_counter()
        truth = topk_set(vx.cosine_topk(queries, unit, k=5))
        t_brute = time.perf_counter() - t0

        t0 = time.perf_counter()
        train_src = (
            unit.filter(F.col("vec_id") < 65536) if n > 100_000 else unit
        )
        # PQ_PROBE_TWIN=1: build the index through the Arrow/numpy
        # throughput twins (bit-identical books and codes — pytest- and
        # probe-asserted), i.e. the production index-build path; the
        # default stays the Column/oracle path so historical rows stay
        # comparable. Query-side timing and recall are unaffected either
        # way (identical codes).
        twin = os.environ.get("PQ_PROBE_TWIN", "") == "1"
        train_fn = vx.pq_train_codebooks_np if twin else vx.pq_train_codebooks
        encode_fn = vx.pq_encode_np if twin else vx.pq_encode
        books = train_fn(
            train_src, subspaces=SUBSPACES, codes=CODES, dim=DIM
        )
        pq_codes = vx.pq_codes_wide(
            encode_fn(unit, books, subspaces=SUBSPACES, dim=DIM)
        ).localCheckpoint(eager=True)
        t_index = time.perf_counter() - t0

        for shortlist in SHORTLISTS:
            t0 = time.perf_counter()
            pq = topk_set(
                vx.pq_topk_refined(
                    queries, pq_codes, books, unit,
                    k=5, subspaces=SUBSPACES, dim=DIM, shortlist=shortlist,
                )
            )
            t_pq_q = time.perf_counter() - t0

            print(
                json.dumps(
                    {
                        "dim": DIM,
                        "mult": mult,
                        "n_vectors": n,
                        "n_queries": N_QUERIES,
                        "subspaces": SUBSPACES,
                        "codes": CODES,
                        "shortlist": shortlist,
                        "index_twin": twin,
                        "brute_sec": round(t_brute, 2),
                        "pq_index_sec": round(t_index, 2),
                        "pq_query_sec": round(t_pq_q, 2),
                        "pq_recall": round(len(truth & pq) / len(truth), 3),
                    }
                ),
                flush=True,
            )
        shutil.rmtree(path, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
