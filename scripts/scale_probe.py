"""Scaling probe: exact Jaccard dedup vs MinHash-LSH as the corpus grows.

Synthesizes N× corpora from the documents table (one scan: crossJoin
with a range, ids shifted per copy), materializes them to scratch
parquet, then times the dedup paths reading from storage. The exact
shingle self-join grows with candidate pairs; the LSH path stays
~linear in documents — the measured basis for the engine's claim that
LSH is the 100 TB path. Not part of CI (minutes at high N).

Copy semantics (r4): by default every word is suffixed with its copy
index, so copies are textually DISJOINT — near-dup structure is
preserved within each copy (both members of a pair get the identical
transformation) while cross-copy collisions vanish. With identical
copies the pair OUTPUT itself grows ∝ mult² (every copy of a doc
near-dups every other copy), so past ~32× the probe measured output
size, not plan scaling (ROUND3_NOTES §4's conclusion). ``--identical``
restores the old semantics for comparison.

Usage: python scripts/scale_probe.py [--no-exact] [--identical] [mults...]
(default 1 2 4; --no-exact skips the all-pairs truth join — required
past ~100k docs; also times the max_bucket-capped LSH variant, the
degenerate-bucket guard for boilerplate-heavy corpora)

``--clusters`` instead times the PRODUCTION dedup composition
(``dedup_clusters_production``: strip → max_bucket-capped 64-hash LSH →
verify → connected components — VERDICT r4 #4's probe row) end-to-end
on the multiplied corpus: register the fixture tables once, then
override the ``documents`` view with the multiplied corpus
(register_tables is idempotent per (session, sf_dir), so the
composition's internal call is a no-op and resolves the override).
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

from hive_plan_service_spark.operators import dedup as dd  # noqa: E402
from hive_plan_service_spark.session import get_spark  # noqa: E402
from hive_plan_service_spark.sources.catalog import register_tables  # noqa: E402


def multiplied_docs(spark, mult: int, *, identical: bool = False):
    """mult× corpus as ONE scan (crossJoin with a range), materialized.

    Materializing to scratch parquet (repartitioned so the scan is
    splittable) keeps the synthesis expressions out of the timed
    operator — the probe measures dedup over storage, like production.
    """
    from hive_plan_service_spark.session import default_parallelism, process_scratch_dir

    base = spark.table("documents")
    n = base.count()
    reps = spark.range(mult).select(F.col("id").alias("_rep"))
    out = base.crossJoin(reps).withColumn(
        "doc_id", F.col("doc_id") + F.col("_rep") * F.lit(n)
    )
    if not identical:
        # suffix every word with "_<copy index>": copies become
        # textually disjoint while each copy keeps the base corpus's
        # near-dup structure (same transformation on both pair members).
        # The separator matters: a bare digit suffix is ambiguous for
        # digit-ending tokens ("foo1"+rep1 == "foo"+rep11), quietly
        # reintroducing cross-copy collisions past mult 10.
        out = out.withColumn(
            "text",
            F.concat_ws(
                " ",
                F.transform(
                    F.split(F.col("text"), " "),
                    lambda w: F.concat(
                        w, F.lit("_"), F.col("_rep").cast("string")
                    ),
                ),
            ),
        )
    out = out.drop("_rep")
    path = os.path.join(
        process_scratch_dir("scale_probe"),
        f"corpus_{mult}{'_id' if identical else ''}",
    )
    out.repartition(default_parallelism()).write.mode("overwrite").parquet(path)
    return spark.read.parquet(path), path


def clusters_main(mults: list[int]) -> None:
    from hive_plan_service_spark.plans.llm_ops import dedup_clusters_production

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="hpss-clusters-scale-probe")
    register_tables(spark, sf_dir)
    for mult in mults:
        docs, corpus_path = multiplied_docs(spark, mult)
        n_docs = docs.count()
        docs.createOrReplaceTempView("documents")
        t0 = time.perf_counter()
        out = dedup_clusters_production(spark, sf_dir, max_bucket=64)
        n_rows = out.count()
        n_comps = out.select("component").distinct().count()
        t_total = time.perf_counter() - t0
        print(
            json.dumps(
                {
                    "op": "dedup_clusters_production",
                    "mult": mult,
                    "n_docs": n_docs,
                    "wall_sec": round(t_total, 2),
                    "docs_per_sec": int(n_docs / t_total),
                    "clustered_docs": n_rows,
                    "components": n_comps,
                }
            ),
            flush=True,
        )
        # restore the fixture view for the next multiplier's strip
        register_tables(spark, sf_dir, force=True)
        shutil.rmtree(corpus_path, ignore_errors=True)
    spark.stop()


def main() -> None:
    args = sys.argv[1:]
    run_exact = "--no-exact" not in args
    if not run_exact:
        args.remove("--no-exact")
    identical = "--identical" in args
    if identical:
        args.remove("--identical")
    if "--clusters" in args:
        if identical:
            # the composition strips boilerplate BEFORE dedup; identical
            # copies would measure output growth, not plan scaling
            # (invariant 23) — reject instead of crashing on int parse
            print("--identical is not supported with --clusters", file=sys.stderr)
            sys.exit(2)
        args.remove("--clusters")
        clusters_main([int(m) for m in args] or [8, 40, 200])
        return
    mults = [int(m) for m in args] or [1, 2, 4]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="hpss-scale-probe")
    register_tables(spark, sf_dir)
    results = []
    for mult in mults:
        docs, corpus_path = multiplied_docs(spark, mult, identical=identical)
        n_docs = docs.count()
        t0 = time.perf_counter()
        lsh_pairs = dd.minhash_lsh_pairs(docs).count()
        t_lsh = time.perf_counter() - t0
        t0 = time.perf_counter()
        capped_pairs = dd.minhash_lsh_pairs(docs, max_bucket=64).count()
        t_capped = time.perf_counter() - t0
        exact_pairs, t_exact = None, None
        if run_exact:
            t0 = time.perf_counter()
            exact_pairs = dd.jaccard_pairs(docs, threshold=0.5).count()
            t_exact = time.perf_counter() - t0
        results.append(
            {
                "mult": mult,
                "identical_copies": identical,
                "n_docs": n_docs,
                "lsh_sec": round(t_lsh, 2),
                "lsh_capped_sec": round(t_capped, 2),
                "capped_pairs": capped_pairs,
                "lsh_pairs": lsh_pairs,
                "exact_sec": round(t_exact, 2) if t_exact is not None else None,
                "exact_pairs": exact_pairs,
            }
        )
        print(json.dumps(results[-1]))
        # the corpora live on tmpfs scratch (RAM): reclaim each
        # multiplier's directory before building the next one
        shutil.rmtree(corpus_path, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
