"""Deterministic integer k-means (operators/kmeans.py).

The registered PQ / IVF-kmeans oracles already hash-check the trainer
end-to-end against DuckDB (tests/test_oracle_parity.py); these tests pin
the properties the oracle can't see: parallelism invariance, the
empty-cluster rule, and the exact-double publish contract.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from hive_plan_service_spark.operators.kmeans import (
    OFFSET,
    SCALE,
    kmeans_integer,
)


def _centroid_map(df):
    cols = df.columns
    key = (lambda r: (r.s, r.code)) if "s" in cols else (lambda r: r.code)
    return {key(r): tuple(r.centroid) for r in df.collect()}


@pytest.fixture()
def training(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec")
    )


def test_centers_invariant_to_partitioning(spark, training):
    """Integer sums are order-free: any input partitioning — including a
    mid-flight shuffle-partition change — yields bit-identical centers
    (the property MLlib's float accumulation could not give)."""
    base = _centroid_map(kmeans_integer(training, k=4, dim=64, iters=3, vec="vec"))
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        scrambled = _centroid_map(
            kmeans_integer(
                training.repartition(13, "vec_id"),
                k=4, dim=64, iters=3, vec="vec",
            )
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert base == scrambled


def test_seed_selection_plan_shape(spark, training):
    """Seed selection must never move the corpus to one task: ungrouped
    → TakeOrderedAndProject (distributed partial top-k); grouped → the
    rank-filter window carries Spark's partial WindowGroupLimit."""
    from pyspark.sql.window import Window as W

    from hive_plan_service_spark.operators.kmeans import quantize

    qu = training.select(
        F.col("vec_id").alias("_pid"), quantize(F.col("vec")).alias("_q")
    )
    planu = qu.orderBy("_pid").limit(8)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in planu

    two = training.withColumn("s", (F.col("vec_id") % 2).cast("int"))
    qg = two.select(
        "s", F.col("vec_id").alias("_pid"), quantize(F.col("vec")).alias("_q")
    )
    w = W.partitionBy("s").orderBy("_pid")
    seeds = qg.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= 4)
    plang = seeds._jdf.queryExecution().executedPlan().toString()
    assert plang.count("WindowGroupLimit") >= 2, plang


def test_empty_cluster_keeps_previous_centroid(spark):
    """Duplicate seeds force a permanently-empty cluster: seeds 0 and 1
    are identical points, so every tie assigns to code 0 and cluster 1
    never owns a member — it must keep its ORIGINAL (quantized) seed
    coordinates instead of vanishing or collapsing to zero."""
    rows = [(0, [0.0, 0.0]), (1, [0.0, 0.0]), (2, [5.0, 0.0]),
            (3, [5.25, 0.0]), (4, [-1.0, 2.0])]
    pts = spark.createDataFrame(rows, "vec_id bigint, vec array<double>")
    out = kmeans_integer(pts, k=3, dim=2, iters=4, vec="vec")
    got = {r.code: tuple(r.centroid) for r in out.collect()}
    assert set(got) == {0, 1, 2}

    def quant_image(v):
        import math

        return tuple(
            math.floor((x + OFFSET) * SCALE) / SCALE - OFFSET for x in v
        )

    assert got[1] == quant_image([0.0, 0.0]), got


def test_published_centroids_are_exact_micro_unit_doubles(spark, training):
    """centroid = c/2^20 − 8 must be exact: re-quantizing the published
    doubles returns the integer grid point (round-trip with no drift)."""
    out = kmeans_integer(training, k=4, dim=64, iters=2, vec="vec")
    for r in out.collect():
        for x in r.centroid:
            scaled = (x + OFFSET) * SCALE
            assert scaled == int(scaled), x


def test_kmeans_np_twin_bit_identical(spark, training):
    """The Arrow/numpy trainer must reproduce the Column trainer
    EXACTLY — grouped and ungrouped — on real fixture vectors: integer
    sums commute, so the only divergence risks are the two float steps
    (quantize/dequantize IEEE sequences) and the argmin tie-break, all
    of which this pins."""
    from hive_plan_service_spark.operators.kmeans import kmeans_integer_np

    col = kmeans_integer(training, k=5, dim=64, iters=3, vec="vec")
    np_ = kmeans_integer_np(training, k=5, dim=64, iters=3, vec="vec")
    assert col.exceptAll(np_).count() == 0
    assert np_.exceptAll(col).count() == 0

    two = training.withColumn("s", (F.col("vec_id") % 2).cast("int"))
    colg = kmeans_integer(two, k=3, dim=64, iters=2, vec="vec",
                          group_cols=("s",))
    npg = kmeans_integer_np(two, k=3, dim=64, iters=2, vec="vec",
                            group_cols=("s",))
    assert colg.exceptAll(npg).count() == 0
    assert npg.exceptAll(colg).count() == 0


def test_kmeans_np_twin_tie_and_empty_cluster(spark):
    """The twin's argmin/first-min and keep-previous-centroid rules must
    match the Column trainer on the adversarial duplicate-seed corpus
    (identical seeds ⇒ distance ties every row ⇒ cluster 1 permanently
    empty), and on a group with fewer points than k."""
    from hive_plan_service_spark.operators.kmeans import kmeans_integer_np

    rows = [(0, [0.0, 0.0]), (1, [0.0, 0.0]), (2, [5.0, 0.0]),
            (3, [5.25, 0.0]), (4, [-1.0, 2.0])]
    pts = spark.createDataFrame(rows, "vec_id bigint, vec array<double>")
    col = kmeans_integer(pts, k=3, dim=2, iters=4, vec="vec")
    np_ = kmeans_integer_np(pts, k=3, dim=2, iters=4, vec="vec")
    assert sorted(map(tuple, col.collect())) == sorted(map(tuple, np_.collect()))

    short = spark.createDataFrame(
        [(0, 0, [1.0, 1.0]), (1, 0, [2.0, 2.0]),
         (2, 1, [3.0, 3.0])],  # group 1 has 1 point < k=2
        "vec_id bigint, s int, vec array<double>",
    )
    colg = kmeans_integer(short, k=2, dim=2, iters=2, vec="vec",
                          group_cols=("s",))
    npg = kmeans_integer_np(short, k=2, dim=2, iters=2, vec="vec",
                            group_cols=("s",))
    assert sorted(map(tuple, colg.collect())) == sorted(map(tuple, npg.collect()))


def test_kmeans_np_twin_rejects_out_of_bound_components(spark):
    """A component outside the documented |x| < 8 bound quantizes
    negative, where numpy's flooring // would silently diverge from
    Spark's truncating div — the twin must fail LOUDLY instead
    (r5 ADVICE)."""
    import pytest

    from hive_plan_service_spark.operators.kmeans import kmeans_integer_np

    pts = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [1.0, 1.0]), (2, [-9.0, 0.0])],
        "vec_id bigint, vec array<double>",
    )
    with pytest.raises(Exception, match="outside the documented"):
        kmeans_integer_np(pts, k=2, dim=2, iters=1, vec="vec")


def test_pq_train_codebooks_np_matches_column(spark, sf_dir):
    """End-to-end PQ wrapper: the numpy-trained codebooks must equal the
    registered oracle path's bit-for-bit (the codebook feeds pq_encode /
    pq_topk, so one differing centroid would silently skew every code)."""
    import hive_plan_service_spark.operators.vectors as vx

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    col = vx.pq_train_codebooks(emb, subspaces=8, codes=8, dim=64, max_iter=3)
    np_ = vx.pq_train_codebooks_np(emb, subspaces=8, codes=8, dim=64, max_iter=3)
    assert col.exceptAll(np_).count() == 0
    assert np_.exceptAll(col).count() == 0


def test_grouped_training_matches_independent_runs(spark, training):
    """Groups are independent: training s=0,1 together equals two
    separate single-group runs (no cross-group leakage)."""
    two = training.withColumn("s", F.col("vec_id") % 2)
    joint = _centroid_map(
        kmeans_integer(two, k=3, dim=64, iters=2, vec="vec",
                       group_cols=("s",))
    )
    for g in (0, 1):
        solo = _centroid_map(
            kmeans_integer(
                two.filter(F.col("s") == g), k=3, dim=64, iters=2,
                vec="vec", group_cols=("s",),
            )
        )
        for key, val in solo.items():
            assert joint[key] == val


def test_kmeans_np_twin_degenerate_inputs(spark):
    """The streaming seed kernel (r6: replaced the grouped window sort)
    must match the Column trainer on the degenerate ends too: an EMPTY
    grouped corpus yields zero centroids on both paths, and a
    single-row group seeds and trains identically."""
    from hive_plan_service_spark.operators.kmeans import kmeans_integer_np

    empty = spark.createDataFrame(
        [], "vec_id bigint, s int, vec array<double>"
    )
    a = kmeans_integer_np(
        empty, k=2, dim=2, iters=2, vec="vec", group_cols=("s",)
    ).collect()
    b = kmeans_integer(
        empty, k=2, dim=2, iters=2, vec="vec", group_cols=("s",)
    ).collect()
    assert a == [] and b == []

    one = spark.createDataFrame(
        [(0, 0, [1.0, 2.0])], "vec_id bigint, s int, vec array<double>"
    )
    a = kmeans_integer_np(
        one, k=3, dim=2, iters=2, vec="vec", group_cols=("s",)
    ).collect()
    b = kmeans_integer(
        one, k=3, dim=2, iters=2, vec="vec", group_cols=("s",)
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert len(a) == 1

    # Mixed NULL and non-NULL group keys (r6 ADVICE): a NULL key is a
    # real partition on the Column path; the twin's pandas kernels see
    # it as NaN and its driver merge must sort None-containing tuples.
    mixed = spark.createDataFrame(
        [(0, None, [1.0, 2.0]), (1, None, [1.5, 2.5]),
         (2, 1, [3.0, 3.0]), (3, 1, [3.5, 3.5]), (4, 1, [0.0, 0.0])],
        "vec_id bigint, s int, vec array<double>",
    )
    a = kmeans_integer_np(
        mixed, k=2, dim=2, iters=2, vec="vec", group_cols=("s",)
    ).collect()
    b = kmeans_integer(
        mixed, k=2, dim=2, iters=2, vec="vec", group_cols=("s",)
    ).collect()
    key = lambda r: ((r[0] is not None, r[0]), r[1])
    assert sorted(map(tuple, a), key=key) == sorted(map(tuple, b), key=key)
    assert {r["s"] for r in a} == {None, 1}

    # NULL-only group (the partials-kernel KeyError class on its own)
    nul = spark.createDataFrame(
        [(0, None, [1.0, 2.0]), (1, None, [2.0, 1.0])],
        "vec_id bigint, s int, vec array<double>",
    )
    a = kmeans_integer_np(
        nul, k=2, dim=2, iters=2, vec="vec", group_cols=("s",)
    ).collect()
    b = kmeans_integer(
        nul, k=2, dim=2, iters=2, vec="vec", group_cols=("s",)
    ).collect()
    assert sorted(map(tuple, a), key=key) == sorted(map(tuple, b), key=key)
