"""Iterative PageRank in exact integer arithmetic (SURVEY.md north-star
iterative-graph family; companion to operators/components.py).

Authority scoring is a standard corpus-curation prior (quality weighting
by link authority). The numeric design choice mirrors the repo's
determinism rule: FLOAT rank sums across a shuffle are
accumulation-order dependent, so two runs can disagree in the last ulps
and a rows-only determinism check flakes. Ranks here are BIGINT
micro-units (``scale`` = 1e12 per unit of probability mass): every
operation is integer multiply/floor-divide/sum — associative, so any
partitioning yields bit-identical ranks, and a driver-side Python model
can reproduce the numbers exactly (tests/test_llm_ops.py).

Scale shape per iteration: one join of edges to ranks on src (shuffle on
src, or co-partitioned if edges are pre-bucketed), one map-side-combined
sum per dst, a left join back to nodes. Driver loop is control flow
only; lineage is cut every ``checkpoint_every`` iterations exactly like
connected_components. Dangling mass (nodes without out-edges) is
redistributed uniformly — in a bipartite graph the sink side would
otherwise drain the walk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Rank unit: 1.0 of probability mass == SCALE integer units.
SCALE = 10**12
#: Damping numerator/denominator (0.85 as integers).
DAMP_NUM, DAMP_DEN = 85, 100


def pagerank(
    edges: DataFrame,
    *,
    iterations: int = 5,
    checkpoint_every: int = 2,
) -> DataFrame:
    """(node, rank) after ``iterations`` rounds; rank in SCALE units.

    ``edges`` is (src BIGINT, dst BIGINT), duplicates meaningful
    (parallel edges weight the walk). All arithmetic is integer:
    ``new = (SCALE div n)·15 div 100 + 85·(contrib + dangling div n) div 100``.
    """
    # Loop-invariant relations materialize ONCE: every iteration joins
    # nodes and out_deg, and without checkpoints each round re-executes
    # their full upstream pipelines — the same re-evaluation trap as
    # connected_components' edge set (r4; the companion fix there
    # measured 20.5 → 5.4 s on the LSH dedup graph).
    edges = edges.localCheckpoint(eager=True)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # graph-size scalar, checkpointed like the other loop invariants
    # (invariant 24) — note this makes pagerank's BUILDER eager: it runs
    # the edges/nodes/degree jobs up front, the deliberate price for not
    # re-running them once per iteration
    n1 = nodes.agg(F.count(F.lit(1)).alias("_n")).localCheckpoint(eager=True)
    out_deg = (
        edges.groupBy(F.col("src").alias("node"))
        .agg(F.count(F.lit(1)).alias("deg"))
        .localCheckpoint(eager=True)
    )
    ranks = nodes.crossJoin(F.broadcast(n1)).select(
        "node", F.expr(f"CAST({SCALE} AS BIGINT) div _n").alias("rank")
    )
    for i in range(iterations):
        r = ranks.join(out_deg, "node", "left")
        contrib = (
            r.filter(F.col("deg").isNotNull())
            .join(edges, r.node == edges.src)
            .select(
                F.col("dst").alias("node"),
                F.expr("rank div deg").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("contrib"))
        )
        dangling = (
            r.filter(F.col("deg").isNull())
            .agg(F.coalesce(F.sum("rank"), F.lit(0)).alias("_dang"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(n1))
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                F.expr(
                    f"(CAST({SCALE} AS BIGINT) div _n) * {DAMP_DEN - DAMP_NUM} div {DAMP_DEN}"
                    f" + {DAMP_NUM} * (coalesce(contrib, CAST(0 AS BIGINT))"
                    f" + _dang div _n) div {DAMP_DEN}"
                ).alias("rank"),
            )
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < iterations:
            # cut lineage: the plan doubles per round otherwise
            ranks = ranks.localCheckpoint(eager=True)
    return ranks
