"""Corpus-curation scaling probe: wall time of the curation operators as
the corpus multiplies.

Inflates the documents table N× (ids shifted, text reused — worst case
for dedup ops: every copy is an exact near-dup) and times the curation
family. What to look for: the shuffle-bound ops (boilerplate strip, line
dedup, decontamination) should grow ~linearly with corpus size; the
shuffle-free ops (normalize, PII scrub, split) should grow sub-linearly
(scan-bound); nothing should inflect quadratically — that would mean a
pair explosion or a lost partial aggregate.

Usage: python scripts/curation_probe.py [--hash-keys] [multipliers...]
(default 1 4 16; --hash-keys switches the segment/shingle join keys to
xxhash64 — the production shuffle-width knob, see curation_ops.HASH_JOIN_KEYS)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from pyspark.sql import functions as F  # noqa: E402

from hive_plan_service_spark.plans.registry import all_queries  # noqa: E402
from hive_plan_service_spark.session import get_spark  # noqa: E402
from hive_plan_service_spark.sources.catalog import register_tables  # noqa: E402

PROBED = (
    "llm_text_normalize",
    "llm_pii_scrub",
    "llm_train_test_split",
    "llm_repetition_ratio",
    "llm_boilerplate_strip",
    "llm_line_dedup_first",
    "llm_decontaminate_ngram",
    "llm_vocab_top_tokens",
    "llm_pretrain_mix_report",
)


def main() -> None:
    args = sys.argv[1:]
    if "--hash-keys" in args:
        args.remove("--hash-keys")
        import hive_plan_service_spark.plans.curation_ops as co
        co.HASH_JOIN_KEYS = True
    mults = [int(m) for m in args] or [1, 4, 16]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="hpss-curation-probe")
    register_tables(spark, sf_dir)
    base = spark.table("documents")
    n0 = base.count()
    registry = all_queries()
    for mult in mults:
        out = base
        for i in range(1, mult):
            out = out.unionByName(
                base.withColumn("doc_id", F.col("doc_id") + F.lit(i * n0))
            )
        out.createOrReplaceTempView("documents")
        row = {"mult": mult, "n_docs": n0 * mult}
        for name in PROBED:
            fn = registry[name].fn
            fn(spark, sf_dir).count()  # warm
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            row[name] = round(time.perf_counter() - t0, 2)
        print(json.dumps(row))
    # restore the real view for any later consumer of this session
    base.createOrReplaceTempView("documents")
    spark.stop()


if __name__ == "__main__":
    main()
