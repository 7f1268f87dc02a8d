"""Near-duplicate clustering: connected components over the dup-pair graph.

Dedup pipelines keep ONE representative per duplicate *cluster*, not per
pair — pairs (a,b),(b,c) must collapse to {a,b,c}.  Components are
computed with iterative label propagation (large-star/small-star
simplified): every node repeatedly adopts the minimum id among itself
and its neighbors until a fixpoint.  Converges in O(log n) rounds on
real dup graphs (components are small and dense); each round is one
join + one aggregation, all keyed shuffles.

This is the genuinely-iterative operator class the DuckDB oracle cannot
express in one query (driver records a rows-only check); correctness is
instead tested against a NetworkX-free union-find on the driver
(tests/test_clusters.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from ..functions.checkpoint import cut_lineage_eager


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iterations: int = 20,
) -> DataFrame:
    """(src, dst) edges -> (node, component) with component = min node id.

    Each iteration propagates the current minimum label across edges;
    AQE handles the shrinking frontier.  ``max_iterations`` bounds the
    driver loop (label propagation needs <= diameter rounds).

    Lineage is truncated with ``localCheckpoint`` every round — without
    it iteration i replans ALL prior joins (exponential plan growth,
    the canonical iterative-Spark failure mode).
    """
    edges = (
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(pairs.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .transform(cut_lineage_eager)
    )
    labels = (
        edges.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .transform(cut_lineage_eager)
    )
    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges.v == labels.node)
            .groupBy("u")
            .agg(F.min("component").alias("nbr_component"))
        )
        propagated = labels.join(
            neighbor_min, labels.node == neighbor_min.u, "left"
        ).select(
            "node",
            F.least(
                F.col("component"),
                F.coalesce(F.col("nbr_component"), F.col("component")),
            ).alias("component"),
        )
        # pointer jumping (path halving): follow the label's own label —
        # turns diameter-bound propagation into O(log n) rounds
        lookup = propagated.select(
            F.col("node").alias("cnode"),
            F.col("component").alias("ccomp"),
        )
        updated = (
            propagated.join(
                lookup, propagated.component == lookup.cnode, "left"
            )
            .select(
                "node",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("ccomp"), F.col("component")),
                ).alias("component"),
            )
            .transform(cut_lineage_eager)
        )
        changed = (
            updated.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = updated
        if changed == 0:
            break
    else:
        # exhausting the budget without a fixpoint would silently split
        # one duplicate cluster into several labels — duplicates would
        # survive dedup undetected; fail loudly instead (path halving
        # converges in O(log diameter), so hitting this means a graph
        # beyond anything max_iterations was sized for)
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} "
            "rounds; raise max_iterations"
        )
    return labels


def dedup_clusters(pairs: DataFrame) -> DataFrame:
    """Pair graph -> (component, size, keep_doc_id) cluster summary."""
    comps = connected_components(pairs)
    return comps.groupBy("component").agg(
        F.count("*").alias("size"),
        F.min("node").alias("keep_doc_id"),
    )
