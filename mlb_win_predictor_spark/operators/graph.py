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


# per-iteration checkpoint release — shared helper (session.py), pinned
# by the private-API smoke test so a Spark upgrade that breaks it is loud
from ..session import release_checkpoint as _release_checkpoint  # noqa: E402


def pagerank(
    edges: DataFrame,
    iterations: int = 10,
    damping: float = 0.85,
    tol: float | None = None,
) -> DataFrame:
    """PageRank over a directed edge list ``(src, dst)``.

    Returns ``(node, rank)`` with ``sum(rank) == 1`` (dangling mass
    redistributed uniformly each step). Deterministic up to float
    aggregation order (~1e-15 per step).

    Everything that does not change across iterations is computed ONCE,
    outside the loop (r7: 17.3s → see docstring of the catalog entry):

    - ``links`` = distinct edges + out-degree, hash-partitioned by
      ``src`` and persisted — so the per-iteration join re-shuffles only
      the rank vector (one row per node), never the edge table. At 100 TB
      the edge table is the big side; shuffling it once instead of once
      per iteration is the difference between O(E) and O(E × iters)
      network traffic. r8: the links build itself is ONE edge shuffle —
      ``repartition("src")`` first, then ``dropDuplicates(src, dst)``
      and a window ``count over (partition by src)`` for the degree,
      both of which Catalyst satisfies WITHOUT further exchange because
      hash(src) already clusters every (src, dst) group and every src
      partition (the r7 shape paid three edge-table shuffles: distinct
      on (src, dst), the degree groupBy, and the repartition after the
      degree join — measured 9.5s → ~5s on the co-purchase entry).
    - the DANGLING NODE SET is static (a node either has out-edges or it
      doesn't); deriving it per-iteration via a left join against the
      degree table (the old shape) paid an extra rank-vector join every
      step. Now the loop does one broadcast semi-join agg for the mass.

    Per iteration: one shuffle of the rank vector (join on ``src``), one
    aggregation (``groupBy dst``), one 1-row broadcast for dangling mass;
    lineage truncated by eager ``localCheckpoint`` with the PREVIOUS
    iteration's checkpoint explicitly unpersisted (bounds storage to one
    rank-vector copy regardless of iteration count).

    CONVERGENCE EARLY-EXIT (r8): with ``tol`` set, iteration stops when
    ``max|rank_t − rank_{t−1}| < tol``. The check is one node-grain join
    of two ALREADY-MATERIALIZED checkpoints (no recompute) reduced to a
    1-row max — the same bounded-action budget the dangling-mass agg
    pays — so converged graphs stop paying scheduler latency for the
    remaining fixed iterations. ``tol=None`` (default) preserves the
    exact fixed-``iterations`` contract the numpy power-iteration oracle
    pins to 1e-9; ``iterations`` is then the CAP.

    SKEW (the 100 TB question, r7 verdict): the per-iteration
    ``groupBy("dst")`` on a power-law graph concentrates a hot node's
    in-edges on one reducer ONLY in name — Catalyst plans a partial
    (map-side) aggregation, so each map partition emits at most one
    pre-summed row per hot key and the final agg receives ≤ n_partitions
    rows per node, independent of in-degree. The skew-exposed edge is
    the ranks⋈links join keyed on ``src`` (a hot OUT-degree node inflates
    one join partition); AQE's skew-join split handles that at runtime
    (enabled in session defaults). Both behaviors are pinned by
    tests/test_operators.py::test_pagerank_power_law_hot_node."""
    from pyspark.sql.window import Window

    # (src, dst, deg): the only big table anything touches, built with
    # ONE edge shuffle. hash(src) clusters every (src, dst) group and
    # every src window partition, so the dedup and the degree count add
    # no exchange; the persisted partitioning then lets every iteration
    # plan a one-sided exchange (rank vector only).
    links = (
        edges.select("src", "dst")
        .repartition("src")
        .dropDuplicates(["src", "dst"])
        .withColumn("deg", F.count(F.lit(1)).over(Window.partitionBy("src")))
        .persist()
    )
    links.count()
    nodes = (
        links.select(F.col("src").alias("node"))
        .union(links.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n_nodes = nodes.count()
    # Static dangling set: nodes with no out-edge. Usually tiny (empty for
    # any symmetrized graph); broadcast into the per-iteration mass agg.
    dangling_nodes = nodes.join(
        links.select(F.col("src").alias("node")).distinct(), "node", "left_anti"
    ).persist()
    has_dangling = dangling_nodes.count() > 0

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
        converged = False
        if tol is not None and prev is not None:
            # both sides are materialized checkpoints: the delta join
            # recomputes nothing, and the agg returns ONE row
            delta = (
                ranks.select("node", F.col("rank").alias("_new"))
                .join(prev.select("node", F.col("rank").alias("_old")), "node")
                .agg(F.max(F.abs(F.col("_new") - F.col("_old"))).alias("d"))
                .first()[0]
            )
            converged = delta is not None and delta < tol
        if prev is not None:
            _release_checkpoint(prev)
        prev = ranks
        if converged:
            break
    links.unpersist()
    nodes.unpersist()
    dangling_nodes.unpersist()
    return ranks
