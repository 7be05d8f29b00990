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


def _release_checkpoint(df: DataFrame) -> None:
    """Unpersist the RDD behind a ``localCheckpoint``'ed DataFrame (the
    checkpointed plan is a LogicalRDD holding the persisted RDD). Without
    this every iteration leaves one full rank-vector copy in block-manager
    storage until driver GC. Best-effort: if the plan shape ever changes,
    ContextCleaner still reclaims on GC."""
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        pass


def pagerank(
    edges: DataFrame,
    iterations: int = 10,
    damping: float = 0.85,
) -> DataFrame:
    """PageRank over a directed edge list ``(src, dst)``.

    Returns ``(node, rank)`` with ``sum(rank) == 1`` (dangling mass
    redistributed uniformly each step). Deterministic up to float
    aggregation order (~1e-15 per step).

    Everything that does not change across iterations is computed ONCE,
    outside the loop (r7: 17.3s → see docstring of the catalog entry):

    - ``links`` = edges pre-joined with out-degree, hash-partitioned by
      ``src`` and persisted — so the per-iteration join re-shuffles only
      the rank vector (one row per node), never the edge table. At 100 TB
      the edge table is the big side; shuffling it once instead of once
      per iteration is the difference between O(E) and O(E × iters)
      network traffic.
    - the DANGLING NODE SET is static (a node either has out-edges or it
      doesn't); deriving it per-iteration via a left join against the
      degree table (the old shape) paid an extra rank-vector join every
      step. Now the loop does one broadcast semi-join agg for the mass.

    Per iteration: one shuffle of the rank vector (join on ``src``), one
    aggregation (``groupBy dst``), one 1-row broadcast for dangling mass;
    lineage truncated by eager ``localCheckpoint`` with the PREVIOUS
    iteration's checkpoint explicitly unpersisted (bounds storage to one
    rank-vector copy regardless of iteration count)."""
    e = edges.select("src", "dst").distinct().persist()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n_nodes = nodes.count()
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # (src, dst, deg): the only big table the loop touches. Partitioned by
    # the join key so each iteration shuffles ranks only — Catalyst reads
    # the persisted partitioning and plans a one-sided exchange.
    links = e.join(out_deg, "src").repartition("src").persist()
    links.count()
    # Static dangling set: nodes with no out-edge. Usually tiny (empty for
    # any symmetrized graph); broadcast into the per-iteration mass agg.
    dangling_nodes = nodes.join(
        e.select(F.col("src").alias("node")).distinct(), "node", "left_anti"
    ).persist()
    has_dangling = dangling_nodes.count() > 0
    e.unpersist()

    ranks = nodes.select("node", F.lit(1.0 / n_nodes).alias("rank"))
    prev = None
    for _ in range(iterations):
        if has_dangling:
            # Rank mass parked on dangling nodes this step, as a 1-row
            # broadcast — no driver-side collect inside the loop.
            dangling = (
                ranks.join(F.broadcast(dangling_nodes), "node", "leftsemi")
                .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dangling_mass"))
            )
        else:
            dangling = ranks.sparkSession.range(1).select(
                F.lit(0.0).alias("dangling_mass")
            )
        contribs = (
            ranks.join(links, ranks["node"] == links["src"])
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("deg")).alias("contrib"))
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
        if prev is not None:
            _release_checkpoint(prev)
        prev = ranks
    links.unpersist()
    nodes.unpersist()
    dangling_nodes.unpersist()
    return ranks
