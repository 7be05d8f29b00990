"""ANN recall/latency frontier harness.

The ANN catalog entries each gate recall >= 0.9 at ONE operating point;
this harness measures the recall@k / wall-time FRONTIER across 3
parameter points per operator family (LSH hash tables, IVF probe count,
PQ re-rank multiplier, SQ8 re-rank pool) against the exact brute-force
oracle, so a user can pick an operator + parameters on evidence instead
of defaults. ``scripts/ann_frontier.py`` runs it at sf0.1 and writes the
committed ``ANN.md`` artifact; ``tests/test_ml.py`` (RUN_SLOW-gated)
reproduces the recall column — recalls are DETERMINISTIC (fixed seeds,
fixed data), wall times are environment-dependent and informational.

Timing discipline mirrors bench.py: clearCache + GC before every point,
each point timed over its own full plan execution (count of the top-k
result), one warm pass for the JVM.
"""

from __future__ import annotations

import gc
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.similarity import (
    ann_topk_lsh,
    exact_topk_cosine,
    ivf_topk,
    pq_topk,
    sq8_topk,
)
from ..session import load_table

K = 10
N_QUERIES = 32

# (family, label, kwargs) — each family's knob sweeps candidate-set size,
# so within a family recall is monotone non-decreasing by construction
# (more tables / probes / pool = superset of candidates under one seed).
CONFIGS: list[tuple[str, str, dict]] = [
    ("lsh", "tables=2", {"num_hash_tables": 2}),
    ("lsh", "tables=4", {"num_hash_tables": 4}),
    ("lsh", "tables=8", {"num_hash_tables": 8}),
    ("ivf", "probe=1/16", {"n_cells": 16, "n_probe": 1}),
    ("ivf", "probe=2/16", {"n_cells": 16, "n_probe": 2}),
    ("ivf", "probe=4/16", {"n_cells": 16, "n_probe": 4}),
    ("ivf", "probe=8/16", {"n_cells": 16, "n_probe": 8}),
    # r7 competitive point: auto cells (3*sqrt(n), spherical sample-trained
    # quantizer) + half-cells probe — the sizing a user gets by default
    ("ivf", "auto(3sqrt(n) cells, 50% probe)", {}),
    ("pq", "rerank=2k", {"m": 16, "n_codes": 16, "rerank_mult": 2}),
    ("pq", "rerank=4k", {"m": 16, "n_codes": 16, "rerank_mult": 4}),
    ("pq", "rerank=8k", {"m": 16, "n_codes": 16, "rerank_mult": 8}),
    ("sq8", "pool=2k", {"pool": 2 * K}),
    ("sq8", "pool=5k", {"pool": 5 * K}),
    ("sq8", "pool=10k", {"pool": 10 * K}),
]

_OPS = {"lsh": ann_topk_lsh, "ivf": ivf_topk, "pq": pq_topk, "sq8": sq8_topk}


def _topk_sets(df: DataFrame) -> dict[int, set[int]]:
    out: dict[int, set[int]] = {}
    for r in df.select("query_id", "cand_id").collect():
        out.setdefault(r.query_id, set()).add(r.cand_id)
    return out


def _timed(spark: SparkSession, fn) -> tuple[DataFrame, float]:
    spark.catalog.clearCache()
    gc.collect()
    spark.sparkContext._jvm.System.gc()
    t0 = time.perf_counter()
    df = fn()
    df.count()
    return df, time.perf_counter() - t0


def ann_frontier(
    spark: SparkSession,
    sf_dir: str,
    k: int = K,
    n_queries: int = N_QUERIES,
    configs: list[tuple[str, str, dict]] = CONFIGS,
    warm: bool = True,
) -> list[dict]:
    """Run the frontier: returns one dict per operating point —
    {"op", "params", "recall", "sec"} — with the exact baseline first
    (recall 1.0 by definition; its time is the cost ANN must beat)."""
    e = load_table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < n_queries).select("vec_id", "embedding")
    corpus = e.filter(F.col("vec_id") >= n_queries).select("vec_id", "embedding")

    if warm:  # absorb JVM/codegen startup so point 1 isn't penalized
        exact_topk_cosine(queries.limit(2), corpus.limit(500), k=k).count()

    exact_df, exact_sec = _timed(
        spark, lambda: exact_topk_cosine(queries, corpus, k=k)
    )
    truth = _topk_sets(exact_df)
    rows = [
        {"op": "exact", "params": "brute-force", "recall": 1.0, "sec": round(exact_sec, 3)}
    ]
    for fam, label, kwargs in configs:
        df, sec = _timed(
            spark, lambda f=fam, kw=kwargs: _OPS[f](queries, corpus, k=k, **kw)
        )
        got = _topk_sets(df)
        recall = sum(
            len(got.get(qid, set()) & cands) / len(cands) for qid, cands in truth.items()
        ) / len(truth)
        rows.append(
            {"op": fam, "params": label, "recall": round(recall, 4), "sec": round(sec, 3)}
        )
    return rows
