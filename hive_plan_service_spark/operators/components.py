"""Connected components — dedup pairs → dedup *clusters*.

Near-dup detection yields pairs, but retention decisions need clusters
(keep exactly one document per group of mutual near-dups). Components
are computed by iterative min-label propagation — the Pregel pattern on
DataFrames:

    label(v) ← min(label(v), min over neighbors label(u))

iterated to fixpoint. Each round is one shuffle on the vertex id; rounds
needed ≈ graph diameter (near-dup clusters are tiny, so 2–4). The loop
is driver-side *control flow only* — no data ever leaves the executors
except the single convergence counter per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 20,
) -> DataFrame:
    """(vertex, component) for every vertex in ``edges``; component = min id.

    Deterministic: labels are vertex-id minima, independent of execution
    order.
    """
    # Materialize the DIRECTED edges before the symmetrizing union: the
    # union's two branches are two instances of the caller's whole
    # edge-producing pipeline, so un-materialized they EXECUTE twice in
    # one stage — r6 measured the capped dedup composition spending
    # 43 s of 57 s re-running its shingle+intersect verify once per
    # union branch (on an AQE-coalesced 2-task read, compounding it).
    # Edge rows are tiny (two ids + weights); this checkpoint is cheap
    # for every caller and cuts the duplicated-subtree class at the
    # operator boundary (invariant 24 applied to the caller's input).
    e0 = edges.select(
        F.col(src).alias("a"), F.col(dst).alias("b")
    ).localCheckpoint(eager=True)
    sym = (
        e0.unionByName(e0.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        # materialize ONCE: sym is joined every propagation round, and
        # without the checkpoint each round re-executes the union above
        # (for the LSH-verify dedup graph the upstream pipeline alone
        # was ~2.7 s at sf0.1 — the un-checkpointed loop measured
        # 20.5 s vs 4.9 s fixed, r4)
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("a").alias("vertex"))
        .distinct()
        .withColumn("component", F.col("vertex"))
    )
    # max_iterations propagation rounds + 1 confirmation round: a graph
    # of diameter exactly max_iterations converges on the final round
    # and still needs one changed==0 observation to prove it
    for _ in range(max_iterations + 1):
        neighbor_min = (
            sym.join(labels, sym.b == labels.vertex)
            .groupBy(F.col("a").alias("vertex"))
            .agg(F.min("component").alias("n_min"))
        )
        updated = (
            labels.join(neighbor_min, "vertex", "left")
            .select(
                "vertex",
                F.least(
                    F.col("component"), F.coalesce("n_min", F.col("component"))
                ).alias("component"),
            )
        )
        # checkpoint BEFORE the changed-probe: counting over the
        # un-materialized frame and then eagerly checkpointing it ran
        # the round's join+aggregate pipeline twice (the same
        # re-evaluation class as the sym checkpoint above)
        updated = updated.localCheckpoint(eager=True)  # cut lineage per round
        changed = (
            updated.alias("u")
            .join(labels.alias("l"), "vertex")
            .filter(F.col("u.component") != F.col("l.component"))
            .limit(1)
            .count()
        )
        labels = updated
        if changed == 0:
            break
    else:
        # silently returning partially-merged labels would diverge from
        # the exact-components oracle on long chains — fail loudly
        raise RuntimeError(
            f"connected_components did not converge within {max_iterations} "
            "iterations (graph diameter too large) — raise max_iterations"
        )
    return labels
