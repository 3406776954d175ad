"""Query/operator registry — the verified inventory of SURVEY.md §2.

Every operator the engine implements registers exactly one named query
here: a PySpark builder ``fn(spark, sf_dir) -> DataFrame`` plus (when the
semantics are SQL-expressible) a DuckDB oracle SQL string over the same
parquet fixtures. ``__spark_entry__.py`` exposes this registry to the
driver's correctness harness; the pytest parity suite runs the identical
comparison locally.

Cross-engine determinism rules (every registered query obeys these so the
order-insensitive value hash matches bit-for-bit):

* Aggregate doubles through exact DECIMAL accumulation, cast to DOUBLE
  only at the output — parallel float summation is order-nondeterministic.
* Never bare-cast DOUBLE→integer (Spark truncates, DuckDB rounds):
  use explicit floor/round.
* Output only flat scalar columns in oracle-checked queries; timestamps
  leave as TIMESTAMP only when exactly representable, else epoch BIGINT.
* Alias every computed column identically in builder and oracle.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str = ""
    tags: tuple[str, ...] = ()


_REGISTRY: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None = None,
    doc: str = "",
    tags: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register an operator query under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""), tags=tags)
        return fn

    return deco


def all_queries() -> dict[str, Query]:
    """Name → Query, import side effects resolved."""
    import hive_plan_service_spark.plans  # noqa: F401  (populates registry)

    return dict(sorted(_REGISTRY.items()))


# The driver's correctness harness verifies at most the first 50 query
# names in sorted order; anything past the window gets no CORRECTNESS row
# at all (round-1 lesson: 48/98 queries were driver-invisible). So the
# registry keeps TWO tiers:
#
# * CANONICAL — exactly ≤50 names, one per operator of SURVEY.md §2
#   (every A*/B* tag is covered) plus the LLM-pipeline family. This is
#   what ``__spark_entry__.queries()`` exposes to the driver.
# * everything else — variants and exact twins, still registered and run
#   by the local pytest parity gate (tests/test_oracle_parity.py iterates
#   ``all_queries()``), just not competing for driver window slots.
#
# Notes on the selection: a09_counter_deltas plus a11_counter_per_key
# cover A9–A12 (the per-key form is the scaled-out superset); the
# fingerprint op is value-checked through llm_corpus_clean_pipeline's
# ``fingerprint`` output column, freeing its slot.
CANONICAL: tuple[str, ...] = (
    "a03_bitmask_expand_join",
    "a04_point_lookup",
    "a05_materialize_roundtrip",
    "a07_get_plans",
    "a08_get_plan_groups_json",
    "a09_counter_deltas",
    "a11_counter_per_key",
    "b01_scan_projection",
    "b01_partitioned_prune",
    "b02_filter_pushdown",
    "b03_computed_projection",
    "b04_join_q3_shipping_priority",
    "b05_join_full_outer",
    "b06_correlated_subquery",
    "b07_range_join_bands",
    "b08_asof_join_purchase_click",
    "b09_agg_pricing_summary",
    "b10_grouping_sets",
    "b11_approx_aggregates",
    "b12_window_functions",
    "b13_global_topk",
    "b14_set_ops",
    "b15_dedup_exact",
    "b16_string_functions",
    "b17_datetime_functions",
    "b18_math_bitwise",
    "b19_array_functions",
    "b20_json_functions",
    "b21_conditional_null",
    "b22_stream_tumbling_window",
    "b22_continuous_hourly_rollup",
    "b23_stream_session_window",
    "b24_stateful_counter_applyinpandas",
    "b25_stream_refresh_sink",
    "b26_pandas_udf",
    "b27_dedup_minhash_lsh",
    "b27_dedup_simhash",
    "b27_dedup_embedding_cosine",
    "b28_cosine_topk",
    "b28_ann_ivf",
    "b28_ann_lsh_hyperplane",
    "b28_embedding_quantize_int8",
    "b29_text_quality",
    "b29_text_langid_ngram",
    "b29_tfidf_top_terms",
    "b30_multimodal_frame_sample",
    "llm_corpus_clean_pipeline",
    "llm_dedup_clusters",
    "llm_doc_chunking",
    "llm_sequence_packing",
)


def canonical_queries() -> dict[str, Query]:
    """The ≤50 driver-visible queries, validated against the registry."""
    qs = all_queries()
    missing = [n for n in CANONICAL if n not in qs]
    if missing:
        raise ValueError(f"CANONICAL names not registered: {missing}")
    if len(CANONICAL) > 50:
        raise ValueError(f"CANONICAL exceeds the driver's 50-row window: {len(CANONICAL)}")
    return {n: qs[n] for n in sorted(CANONICAL)}


def query_fns(canonical_only: bool = True) -> dict[str, QueryFn]:
    qs = canonical_queries() if canonical_only else all_queries()
    return {n: q.fn for n, q in qs.items()}


def oracle_sqls(canonical_only: bool = True) -> dict[str, str]:
    qs = canonical_queries() if canonical_only else all_queries()
    return {n: q.oracle for n, q in qs.items() if q.oracle is not None}
