"""Regenerate PLANS.md from live explain("formatted") output."""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mlb_win_predictor_spark.queries import QUERIES  # noqa: E402
from mlb_win_predictor_spark.session import get_spark  # noqa: E402

PICKS = [
    ("scan_project_filter", "filter + projection pushed into the parquet scan"),
    ("q1_pricing_summary", "partial (map-side) aggregation before the single exchange"),
    ("broadcast_dim_join", "dim enrichment with zero fact-side shuffle"),
    ("q5_region_revenue", "5-way star join: every dim broadcast, one agg exchange"),
    ("flagship_asof_funnel", "as-of window + aggregation: one hash partitioning"),
    ("nearest_centroid_assign", "centroid broadcast + per-row argmin"),
    ("q18_large_orders", "having-filtered agg joined back: AQE sizes the join at runtime"),
    ("dense_global_index", "global dense ids via range partitioning — no SinglePartition stage"),
    ("tfidf_top_terms", "two hash aggs + broadcast corpus count + per-doc rank window"),
    ("q6_forecast_revenue", "full predicate pushdown + 4-column pruned scan, partial agg only"),
    ("q4_order_priority", "EXISTS as left-semi join (no payload, build-side dedup)"),
    ("decontamination_overlap", "benchmark gram set broadcast; corpus streams map-only into partial agg"),
    ("ngram_repetition", "staged projections: tokens→grams materialized once, zero shuffle"),
    ("q21_waiting_supplier", "decorrelated EXISTS/NOT-EXISTS: one lineitem scan, groupBy + windows over one l_orderkey exchange"),
    ("q17_small_quantity_revenue", "correlated per-part avg join-back (un-hinted: per-part stats scale with SF; AQE broadcasts at bench size)"),
    ("q22_sales_opportunity", "scalar-subquery threshold broadcast + left-anti against date-pruned recent orders"),
    ("crossdoc_dup_fraction", "hashed-long grams; doc-frequency as count-over-window — one gram exchange feeds count and per-row df"),
    ("dedup_jaccard_prefix", "PPJoin on hashed shingles: df-ranked prefix self-join, length+positional prunes; re-check sides un-hinted (AQE broadcasts when they fit, shuffled join at corpus scale)"),
    ("bm25_score", "corpus stats as one broadcast agg; per-doc tf stays map-only"),
    ("table_diff_reconcile", "co-partitioned full-outer changeset on the snapshot key"),
    ("time_resample_ffill", "calendar explode map-side; one window per user for the ffill"),
    ("winsorize_per_group", "percentile bounds broadcast back; clamp is map-only"),
    ("key_skew_profile", "key histogram + broadcast scalar total, TakeOrderedAndProject top-k"),
    ("corpus_prep_pipeline", "quality gate + dedup window + chunk explode fused into one plan, two exchanges"),
    ("balanced_mixture_sample", "broadcast count gate: integer hash predicate filters map-side, zero corpus shuffle"),
    ("vocab_top_terms", "map-side-combined (lang,term) agg; top-k as WindowGroupLimit, no global sort"),
    ("duplicated_span_dedup", "ONE corpus scan: per-(gram,doc) position lists, doc-frequency as count-over-window on the compacted table; islands windows + span rollup share the doc_id exchange"),
    ("hybrid_search_rrf", "both ranker pools via TakeOrderedAndProject (distributed top-k, no global sort); rank windows touch only pool rows"),
    ("similarity_sq8_rerank", "per-dim stats as one 64-group agg broadcast; coarse pass map-only over dequantized codes; exact re-rank joins the tiny pool back, AQE-broadcast"),
    ("time_weighted_avg", "lead-window and groupBy share one event_type exchange; exact µs×decimal fold"),
    ("recursive_hierarchy_rollup", "native WITH RECURSIVE: per-level frontier joins against the static part scan (UnionLoop), then one rollup agg"),
    ("lateral_topn_subquery", "correlated LATERAL+LIMIT decorrelated to broadcast join + map-side WindowGroupLimit (partial below the exchange)"),
    ("span_removal_stats", "one-scan staging shared with duplicated_span_dedup; gram window carries df AND min-doc on one exchange"),
    ("bitmap_distinct_rollup", "exact mergeable distinct: per-bucket bitmaps, daily sum(bitmap_count) + or_agg re-merge for totals — no fact rescan"),
    ("source_overlap_matrix", "per-gram source sets from ONE agg (df==1 dropped pre-pairing); pairs expanded map-side, no self-join"),
    ("quantile_binning", "exact NTILE without a SinglePartition window: range-partitioned dense index + bucket arithmetic"),
    ("similarity_filtered_topk", "metadata predicate as the JOIN KEY (pre-filter): label equality is the hash key, queries broadcast"),
    ("bigram_logprob_quality", "staged token projection (split once), xxhash64-long keys on every exchange; model joins vocab-bounded"),
    ("time_interpolate_linear", "backward + forward ignore-nulls windows over ONE per-user partitioning"),
]

# Static appendix blocks preserved across regenerations (A/B evidence that
# is measured, not derived from a live plan dump).
APPENDIX = """
## recursive_hierarchy_rollup — per-iteration latency floor (round-4 A/B)

The entry costs ~1.5s at sf0.1 — the most expensive non-PPJoin headline
entry. Round-4 A/B (median of 3 warm runs, local[32], sf0.1):

| variant | time | note |
|---|---|---|
| full recursion (anchor + 4 join levels) | 1.50–1.79s | as shipped |
| `AND w.depth < 3` (3 join levels) | 1.25s | −1 level ≈ −0.25s |
| `AND w.depth < 1` (1 join level) | 0.60s | |
| trivial body, 5 levels, NO join | 0.43–0.53s | pure `UnionLoop` floor ≈ 0.09s/iteration |
| `/*+ BROADCAST(w) */` on the frontier | 1.39–1.52s | REJECTED: last-level frontier is O(\\|part\\|) — not broadcastable at scale |
| `/*+ REPARTITION(4) */` recursive member | 1.26–1.46s | REJECTED: hardcodes bench-sized partitioning; at 100 TB the level outputs need real parallelism |

Conclusion: cost = ~0.09s/iteration UnionLoop scheduling floor plus
~0.2s/level of exchange latency on a 20k-row join — fixed overhead, not
data-proportional work. The iteration count is `log10(max key)` and grows
only logarithmically with the keyspace, so at 100 TB the same ~5-7
iterations amortize over real per-level join work; the bench-scale cost
IS the floor. Both hint variants buy <15% here by pinning plan choices
that are wrong at scale — kept un-hinted, AQE decides per level.

## bigram_logprob_quality — staged-projection A/B (round 4)

Inlining the regex `split` into the bigram-building `transform` lambda
re-evaluates the split per array ELEMENT (Catalyst does not CSE the
subexpression across lambda invocations): 8.6–9.2s at sf0.1. Staging the
token array in its own projection first (`select(split(...).alias("toks"))`
then transform over the column) drops the same plan to 1.5–1.7s — a 5x
win from one projection boundary. Rule now applied across the text
family: any array consumed inside a HOF lambda is materialized by a
staged projection first.
"""


def main() -> None:
    spark = get_spark(shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    sf = "/root/testdata/sf0.01"
    out = [
        "# PLANS — physical plans of representative catalog queries",
        "",
        f"Generated by `python scripts/dump_plans.py` (Spark {spark.version}, sf0.01).",
        "Plan-shape invariants are enforced by `tests/test_plans.py`; this file is",
        "the human-readable evidence.",
        "",
    ]
    for name, why in PICKS:
        df = QUERIES[name].fn(spark, sf)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        tree = buf.getvalue().split("\n\n")[0]
        out += [f"## {name}", "", f"*{why}*", "", "```", tree.strip(), "```", ""]
    out.append(APPENDIX.strip())
    out.append("")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "PLANS.md"), "w") as fh:
        fh.write("\n".join(out))


if __name__ == "__main__":
    main()
