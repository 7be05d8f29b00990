"""Distributed PageRank as a DataFrame loop — the iterative-algorithm
pattern (fixed-point over a shuffle-joined edge table) the engine's other
iteration, connected components (operators/dedup.py::components_from_pairs),
also uses.

No GraphFrames dependency: ranks and edges are plain DataFrames, one hash
join + one aggregation per iteration, lineage truncated by
``localCheckpoint`` every iteration so the plan stays O(1) deep (at
cluster scale, ``checkpoint()`` to durable storage). Dangling-node mass is
redistributed uniformly, so total rank is conserved at every step — the
numpy power-iteration oracle in tests/test_operators.py matches to 1e-9.

Scale: per iteration the only shuffle is the edge join keyed on ``src``
(co-partitionable with the previous iteration's ranks — Spark reuses the
hash partitioning across iterations) plus a groupBy on ``dst``. Rank state
is one row per node; edges are never mutated. The reference has no graph
surface (SURVEY.md §1.4); this is engine surface for the north-star
lineage/link-analysis ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iterations: int = 10,
    damping: float = 0.85,
) -> DataFrame:
    """PageRank over a directed edge list ``(src, dst)``.

    Returns ``(node, rank)`` with ``sum(rank) == 1`` (dangling mass
    redistributed uniformly each step). Deterministic up to float
    aggregation order (~1e-15 per step)."""
    edges = edges.select("src", "dst").distinct().persist()
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n_nodes = nodes.count()
    out_deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    ranks = nodes.select("node", F.lit(1.0 / n_nodes).alias("rank"))
    for _ in range(iterations):
        with_deg = ranks.join(out_deg, ranks["node"] == out_deg["src"], "left")
        # Dangling mass (rank held by nodes with no out-edges) as a 1-row
        # broadcast — no driver-side collect inside the loop.
        dangling = with_deg.filter(F.col("deg").isNull()).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dangling_mass")
        )
        contribs = (
            with_deg.filter(F.col("deg").isNotNull())
            .select("node", (F.col("rank") / F.col("deg")).alias("share"))
            .join(edges, F.col("node") == edges["src"])
            .groupBy("dst")
            .agg(F.sum("share").alias("contrib"))
        )
        ranks = (
            nodes.join(contribs, nodes["node"] == contribs["dst"], "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n_nodes)
                    + F.lit(damping) * F.col("dangling_mass") / F.lit(float(n_nodes))
                    + F.lit(damping) * F.coalesce(F.col("contrib"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks
