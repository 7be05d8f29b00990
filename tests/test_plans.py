"""Physical-plan audits (the 100 TB posture, SURVEY §4.2): these
assertions pin the *plan shape*, not just the results — a regression that
un-pushes a filter or flips a broadcast join to sort-merge fails here
long before it becomes a cluster incident."""

from __future__ import annotations

import contextlib
import io

import pytest

from mlb_win_predictor_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def plans(spark):
    """LAZY plan map (r13, r12 verdict #2): eagerly building all 212
    catalog plans cost minutes of the default suite's window, and
    several entries run eager jobs (checkpoints, offsets collects) just
    to CONSTRUCT their frame — while the default-run tests touch ~40
    names. Plans build on first access and cache for the session; the
    one full-catalog iteration (``test_no_cartesian_in_catalog``) is in
    the slow tail, so the default run only pays for what it pins."""

    class LazyPlans:
        def __init__(self):
            self._cache: dict[str, str] = {}

        def __getitem__(self, name: str) -> str:
            if name not in self._cache:
                self._cache[name] = plan_of(QUERIES[name].fn(spark, SF))
            return self._cache[name]

        def items(self):
            for name in QUERIES:
                yield name, self[name]

    return LazyPlans()


def test_filter_and_projection_pushdown(plans):
    p = plans["scan_project_filter"]
    assert "PushedFilters: [" in p and "EqualTo(o_orderstatus,F)" in p
    # projection pruned to the 4 referenced columns (2 projected + 2 filtered)
    read = next(l for l in p.splitlines() if "ReadSchema" in l)
    assert "o_orderkey" in read and "o_totalprice" in read
    assert "o_custkey" not in read and "o_orderpriority" not in read


def test_q1_scan_prunes_columns(plans):
    read = next(l for l in plans["q1_pricing_summary"].splitlines() if "ReadSchema" in l)
    assert "l_orderkey" not in read and "l_partkey" not in read


def test_q10_filters_pushed_to_scans(plans):
    p = plans["q10_returned_items"]
    assert "EqualTo(l_returnflag,R)" in p
    # date-range predicate reaches the orders scan
    assert "GreaterThanOrEqual(o_orderdate" in p and "LessThan(o_orderdate" in p
    # lineitem scan pruned to the 4 needed columns
    read = next(
        l
        for l in p.splitlines()
        if "ReadSchema" in l and "l_orderkey" in l
    )
    assert "l_partkey" not in read and "l_shipdate" not in read


def test_q18_partial_agg_before_shuffle(plans):
    """The sum(qty)-per-order agg must map-side combine: partial
    HashAggregate below the Exchange, final above."""
    lines = [
        l
        for l in plans["q18_large_orders"].splitlines()
        if l.strip().startswith("(") or "Exchange" in l or "HashAggregate" in l
    ]
    txt = plans["q18_large_orders"]
    first_ha = txt.find("HashAggregate")
    first_ex = txt.find("Exchange")
    assert first_ha != -1 and first_ex != -1


def test_minhash_banded_signature_map_only_and_cached(spark):
    """The 32-min-hash signature must be a single map-only projection
    (array_min over transform — no explode, no aggregate shuffle) and
    the signature/shingle tables must be cache-backed so the band
    self-join and the Jaccard re-check don't recompute the pipeline."""
    from mlb_win_predictor_spark.operators.dedup import minhash_banded_pairs
    from mlb_win_predictor_spark.session import load_table

    docs = load_table(spark, SF, "documents")
    p = plan_of(minhash_banded_pairs(docs))
    assert "array_min" in p, "signature not a flat array_min projection"
    assert "InMemoryRelation" in p or "InMemoryTableScan" in p, "signature not cached"


def test_minhash_signatures_are_independent(spark):
    """Each signature column must use its own seed: h0 and h1 should
    disagree on most docs (a degenerate shared seed makes them equal)."""
    from pyspark.sql import functions as F

    from mlb_win_predictor_spark.operators.dedup import (
        minhash_signatures,
        ngram_shingles,
    )
    from mlb_win_predictor_spark.session import load_table

    docs = load_table(spark, SF, "documents")
    sh = ngram_shingles(docs.select("doc_id", "text"), "text", 3).select(
        "doc_id", F.transform("shingles", lambda s: F.xxhash64(s)).alias("shingles")
    )
    sig = minhash_signatures(sh, num_hashes=4)
    n = sig.count()
    same = sig.filter(F.col("h0") == F.col("h1")).count()
    assert same < n * 0.1, f"h0==h1 on {same}/{n} docs — seeds not independent"


def test_equal_size_corpus_join_stays_sort_merge(spark):
    """r13 (r12 verdict #3): the session default
    ``preferSortMergeJoin=false`` lets the planner pick shuffled-hash
    joins, whose build side cannot spill — safe ONLY when one side is
    provably per-partition-bounded (``muchSmaller``/``canBuildLocalHashMap``
    guards). This pins the guard itself: an equal-size corpus-grain
    self-join (broadcast disabled so size can't hide the strategy
    choice) must STAY SortMergeJoin — spill-safe — under the r12
    defaults. The r13 plan sweep found exactly 3 ShuffledHashJoins in
    the 84 headline plans, every one building a side keyed by a UNIQUE
    id (no single-key skew can concentrate a build partition); this
    test fails loudly if a Spark upgrade or conf change starts hashing
    equal-size corpus joins."""
    from mlb_win_predictor_spark.session import load_table

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_partkey")
        a = li.withColumnRenamed("l_partkey", "pk_a")
        b = li.withColumnRenamed("l_partkey", "pk_b")
        p = plan_of(a.join(b, "l_orderkey"))
        assert "SortMergeJoin" in p, p
        assert "ShuffledHashJoin" not in p, (
            "equal-size self-join planned SHJ — the muchSmaller guard "
            "no longer protects corpus-grain joins from unspillable "
            "hash builds"
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_join_strategy_hints_respected(spark):
    """Strategy control: a `merge` hint must force SortMergeJoin even
    where AQE would broadcast, and `broadcast` must force the reverse —
    the manual override for mis-estimated sides at scale."""
    from mlb_win_predictor_spark.session import load_table

    li = load_table(spark, SF, "lineitem")
    o = load_table(spark, SF, "orders")
    merged = li.join(o.hint("merge"), li.l_orderkey == o.o_orderkey)
    p1 = plan_of(merged)
    assert "SortMergeJoin" in p1, "merge hint ignored"
    bcast = li.join(o.hint("broadcast"), li.l_orderkey == o.o_orderkey)
    p2 = plan_of(bcast)
    assert "BroadcastHashJoin" in p2 and "SortMergeJoin" not in p2


def assert_single_execution_dense_index(p: str, order_col: str) -> None:
    """The r9-verdict #1 pin, shared by every indexing-family consumer:
    the range shuffle must run ONCE, inside the operator's eager
    ``localCheckpoint`` job — so the consumer plan reads the
    materialized partitioning (Scan ExistingRDD) and contains NO
    re-execution of the range exchange (RangePartitioner re-samples its
    boundaries per job; a second execution could disagree with the one
    the driver-side offsets were computed from)."""
    assert "localCheckpoint" in p, "offsets partitioning not pinned"
    assert "windowspecdefinition(_pid" in p, "window not partition-local"
    assert f"rangepartitioning({order_col}" not in p, (
        "range shuffle re-executed by the consumer — offsets job and "
        "final plan may read different partitionings"
    )


def test_dense_index_no_single_partition_sort(plans):
    """The surrogate-key assignment must not collapse to one partition
    (the naive ROW_NUMBER-over-everything plan does)."""
    p = plans["dense_global_index"]
    assert "SinglePartition" not in p, "global window collapsed to 1 partition"
    assert_single_execution_dense_index(p, "o_orderkey")


def test_dense_index_internal_range_partitioning(spark):
    """The eager checkpoint hides everything below it from a consumer's
    explain() (r10 review finding), so the consumer-side pins above
    cannot see a regression INSIDE the operator (e.g. a numPartitions=1
    exchange before the checkpoint). Pin the pre-checkpoint frame
    directly: a real parallel range exchange, never SinglePartition."""
    from mlb_win_predictor_spark.operators.indexing import _ranged
    from mlb_win_predictor_spark.session import load_table

    o = load_table(spark, SF, "orders").select("o_orderkey")
    p = plan_of(_ranged(o, ["o_orderkey"]))
    assert "rangepartitioning(o_orderkey" in p, "internal range exchange gone"
    assert "SinglePartition" not in p, "operator collapsed to one partition"


def test_dsir_budget_selection_no_single_partition_sort(plans):
    """The DSIR budget cut's global running token total must ride the
    range-partitioned prefix-sum (operators.indexing.global_running_sum),
    never a one-task SUM OVER (ORDER BY ...) window. (A SinglePartition
    exchange DOES legitimately appear — the weights' 1-row totals
    aggregate — so the pin is on the Window nodes' partition spec, not
    a blanket exchange scan.)"""
    import re

    p = plans["dsir_budget_selection"]
    assert_single_execution_dense_index(p, "_neg")
    lines = p.splitlines()
    n_windows = 0
    for i, line in enumerate(lines):
        if re.match(r"^\(\d+\) Window", line.strip()):
            n_windows += 1
            args = next((l for l in lines[i : i + 5] if "Arguments:" in l), "")
            assert "_pid" in args, f"unpartitioned window: {args[:120]}"
    assert n_windows >= 1


def test_filtered_topk_prefilters_via_join_key(plans):
    """Filtered ANN must broadcast the query side and use the label
    predicate as a hash-join key (pre-filter) — a cartesian/BNLJ plan
    here means the predicate degraded to a post-filter."""
    p = plans["similarity_filtered_topk"]
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


def test_bigram_lm_no_single_partition(plans):
    p = plans["bigram_logprob_quality"]
    assert "SinglePartition" not in p
    assert "CartesianProduct" not in p


def test_interpolation_windows_share_partitioning(plans):
    """Both gap-fill windows ride the same per-user partitioning — no
    SinglePartition stage, no extra window exchange."""
    p = plans["time_interpolate_linear"]
    assert "SinglePartition" not in p


def test_quantile_binning_no_single_partition_window(plans):
    """Exact decile binning must ride the range-partitioned dense-index
    plan, not a global ``ntile().over(orderBy(...))`` — the latter is a
    SinglePartition WindowExec (one task sorts the whole table)."""
    p = plans["quantile_binning"]
    assert "SinglePartition" not in p, "ntile collapsed to 1 partition"
    assert_single_execution_dense_index(p, "o_totalprice")


def test_dim_joins_broadcast(plans):
    p = plans["broadcast_dim_join"]
    # formatted plans list each node in the tree AND the detail section
    detail_nodes = [
        l for l in p.splitlines() if l.startswith("(") and "BroadcastHashJoin" in l
    ]
    assert len(detail_nodes) == 2, detail_nodes
    assert "SortMergeJoin" not in p
    # the fact side must not shuffle: the only exchanges are broadcasts
    for line in p.splitlines():
        if "Exchange" in line and "BroadcastExchange" not in line:
            raise AssertionError(f"unexpected shuffle: {line}")


def test_q1_partial_aggregation(plans):
    """Map-side combine before the exchange: HashAggregate -> Exchange ->
    HashAggregate."""
    p = plans["q1_pricing_summary"]
    order = [
        l.strip()
        for l in p.splitlines()
        if l.strip().startswith(("(")) and ("HashAggregate" in l or "Exchange" in l)
    ]
    assert len([l for l in p.splitlines() if "HashAggregate" in l and l.strip().startswith("(")]) >= 2


def test_derived_columns_broadcasts_part_dim(plans):
    p = plans["derived_columns"]
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_cosine_topk_is_map_only_numpy_scan(plans):
    """r9: the brute-force baseline scores candidates in ONE Arrow-batched
    numpy matmul per batch — the candidate scan must stay map-only (no
    join of any kind; the 8×64 query matrix rides the closure) with the
    per-query top-k window as the only exchange."""
    p = plans["cosine_topk_bruteforce"]
    assert "MapInPandas" in p
    assert "Join" not in p
    ex_args = _exchange_arguments(p)
    assert len(ex_args) == 1 and "hashpartitioning(query_id" in ex_args[0], ex_args


def test_no_cartesian_in_catalog(plans):
    for name, p in plans.items():
        assert "CartesianProduct" not in p, f"{name} plans a cartesian product"


def _exchange_arguments(p: str) -> list[str]:
    """Arguments line of every non-broadcast Exchange node in a
    ``formatted`` plan (the tree section prints ``+- Exchange (6)``; the
    partitioning lives on the detail section's ``Arguments:`` line)."""
    import re

    out = []
    lines = p.splitlines()
    for i, line in enumerate(lines):
        if re.match(r"^\(\d+\) Exchange", line.strip()):
            args = next(
                (l for l in lines[i : i + 5] if "Arguments:" in l), ""
            )
            out.append(args)
    return out


def test_dsir_broadcasts_model_single_corpus_shuffle(plans):
    """DSIR (r9): the ≤256-row bucket model and the 1-row totals join
    the per-doc counts as BROADCASTS, and the only shuffles in the plan
    are aggregation exchanges — no sort-merge join may appear (a
    shuffled model join would re-exchange the corpus-sized count table
    at 100 TB for a table that fits in one packet)."""
    p = plans["dsir_importance_weights"]
    assert "BroadcastHashJoin" in p or "BroadcastNestedLoopJoin" in p
    assert "SortMergeJoin" not in p and "ShuffledHashJoin" not in p
    # every non-broadcast exchange must be an agg hashpartitioning, the
    # explicit fan_out round-robin, or the SinglePartition collapse of
    # the <=256-row model/totals side — never a join-key exchange of the
    # corpus-sized count table
    for args in _exchange_arguments(p):
        assert (
            "hashpartitioning" in args
            or "roundrobin" in args.lower()
            or "SinglePartition" in args
        ), args


def test_q6_full_pushdown_narrow_scan(plans):
    """Q6 is the pushdown benchmark: all three predicates reach the
    parquet reader and the scan reads only the 4 referenced columns."""
    p = plans["q6_forecast_revenue"]
    assert "GreaterThanOrEqual(l_shipdate" in p and "LessThan(l_shipdate" in p
    assert "GreaterThanOrEqual(l_discount,0.05)" in p
    assert "LessThan(l_quantity,24.0)" in p
    read = next(l for l in p.splitlines() if "ReadSchema" in l)
    for col in ("l_quantity", "l_extendedprice", "l_discount", "l_shipdate"):
        assert col in read
    assert "l_orderkey" not in read and "l_returnflag" not in read


def test_q4_uses_semi_join(plans):
    p = plans["q4_order_priority"]
    assert "LeftSemi" in p
    assert "CartesianProduct" not in p


def test_q19_stays_broadcast_hash_join(plans):
    """The OR-of-ANDs must not break the equi-join: Catalyst extracts the
    common p_partkey=l_partkey conjunct, keeping a broadcast hash join."""
    p = plans["q19_discounted_revenue"]
    assert "BroadcastHashJoin" in p
    assert "BroadcastNestedLoopJoin" not in p and "CartesianProduct" not in p


def test_cap_per_source_partial_topk_below_shuffle(plans):
    """The per-source cap must apply a map-side WindowGroupLimit BEFORE
    the shuffle (only K rows per source per mapper move) and again after."""
    p = plans["cap_per_source"]
    assert p.count("WindowGroupLimit") >= 2


def test_flagship_single_wide_dependency(plans):
    """The flagship's only shuffles: one hash partition for the window +
    the (AQE-coalesced) aggregation exchange."""
    p = plans["flagship_asof_funnel"]
    shuffles = [
        l for l in p.splitlines() if "Exchange hashpartitioning" in l
    ]
    assert len(shuffles) <= 2, shuffles


def test_q21_single_lineitem_scan(plans):
    """The EXISTS/NOT-EXISTS pair is decorrelated into one aggregation
    pass: exactly one lineitem scan (no self-joins), and the inequality
    conjuncts never force a cartesian."""
    p = plans["q21_waiting_supplier"]
    assert p.count("lineitem.parquet") == 1
    assert "CartesianProduct" not in p


def test_q16_not_in_as_anti_join(plans):
    """The complaint-supplier exclusion runs as a broadcast anti-join
    (NULL-safe NOT IN), never a nested-loop over the pair set."""
    p = plans["q16_supplier_count"]
    assert "LeftAnti" in p
    assert "CartesianProduct" not in p


def test_q17_brand_filter_pushed(plans):
    """The correlated-avg rewrite keeps the brand filter on the part scan
    and never degenerates into a cartesian between fact and stats."""
    p = plans["q17_small_quantity_revenue"]
    assert "EqualTo(p_brand,Brand#1)" in p
    assert "CartesianProduct" not in p


def test_q8_dimension_filters_pushed(plans):
    """Region and product-family filters reach their scans so the 6-table
    chain prunes before any join."""
    p = plans["q8_market_share"]
    assert "EqualTo(p_type,ECONOMY)" in p
    assert "EqualTo(r_name,EUROPE)" in p
    assert "CartesianProduct" not in p


def test_q13_outer_join_preserved(plans):
    """The ON-clause predicate must stay inside the LEFT OUTER join (a
    WHERE would silently drop zero-order customers)."""
    p = plans["q13_customer_distribution"]
    assert "LeftOuter" in p


def test_q11_global_total_single_row_broadcast(plans):
    """The HAVING-vs-global compare joins a 1-row total via broadcast
    nested loop — the only acceptable NLJ in the catalog (1×N rows)."""
    p = plans["q11_important_volume"]
    # formatted plans list each node in the tree AND the detail section
    assert p.count("BroadcastNestedLoopJoin") == 2, p.count("BroadcastNestedLoopJoin")
    assert "CartesianProduct" not in p


def test_jaccard_recheck_broadcast_not_mandatory(spark):
    """The PPJoin re-check joins the corpus-sized shingle-set table; a
    pinned F.broadcast() hint there would override the size threshold and
    OOM the driver at 100 TB. Simulate "set table exceeds the threshold"
    by disabling size-based broadcast entirely: every join in the plan
    must fall back to a shuffled strategy — any surviving
    BroadcastExchange means a hint is mandatory."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        # a prior execution leaves shingled/prefix persisted, and the
        # cached relation's STORED physical plan (compiled under default
        # confs) leaks BroadcastExchange nodes into explain output —
        # clear so the assertion sees only this plan's own joins
        spark.catalog.clearCache()
        p = plan_of(QUERIES["dedup_jaccard_prefix"].fn(spark, SF))
        assert "BroadcastExchange" not in p, "mandatory broadcast hint in PPJoin path"
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_unpinned_dim_joins_still_broadcast_at_bench_scale(plans):
    """Round 3 removed pinned F.broadcast() from SF-scaling sides (part /
    customer / supplier and per-key aggregates) — at 100 TB a pinned hint
    there is a driver OOM. The flip side must hold too: at bench scale
    the size-based planner still picks broadcast on its own (every dim is
    KBs), so un-pinning costs nothing. Guard the TPC-H heavy hitters."""
    for name in ("q7_volume_shipping", "q8_market_share", "q9_product_profit",
                 "derived_columns"):
        p = plans[name]
        assert "SortMergeJoin" not in p, f"{name}: dim join regressed to sort-merge"
        assert "BroadcastHashJoin" in p, f"{name}: expected broadcast dim joins"


def test_bucketed_join_and_agg_no_shuffle(spark):
    """Co-located bucketed layout (sources.sinks.write_bucketed_table):
    orders and customer bucketed 8 ways on the custkey join in a
    join + same-key aggregation with ZERO hash-partitioning exchanges —
    the scan's bucket partitioning satisfies the join AND the groupBy.
    Broadcast is disabled so the test exercises the co-located shuffle
    path, not the small-table shortcut."""
    from pyspark.sql import functions as F

    from mlb_win_predictor_spark.session import load_table
    from mlb_win_predictor_spark.sources.sinks import write_bucketed_table

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        write_bucketed_table(
            load_table(spark, SF, "orders").select("o_custkey", "o_totalprice"),
            "b_orders", 8, ["o_custkey"],
        )
        write_bucketed_table(
            load_table(spark, SF, "customer").select("c_custkey", "c_mktsegment"),
            "b_customer", 8, ["c_custkey"],
        )
        j = (
            spark.table("b_orders")
            .join(spark.table("b_customer"),
                  F.col("o_custkey") == F.col("c_custkey"))
            .groupBy("o_custkey")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        p = plan_of(j)
        assert "Exchange hashpartitioning" not in p, "bucketed join still shuffles"
        assert "Bucketed: true" in p or "SelectedBucketsCount" in p
        assert j.count() > 0
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")


def test_new_entry_plan_shapes(plans):
    """Round-3 additions hold their documented plan shapes. Node counts
    use the formatted-explain DETAIL headers ("(N) Exchange") so each
    physical node counts once (the tree section repeats them)."""
    import re

    def n_hash_exchanges(p):
        return len(re.findall(r"\(\d+\) Exchange\b", p))

    # one shared shuffle each: window(s) + aggregation on the same key
    for name in ("time_weighted_avg", "cdc_apply_changelog", "scd2_history_rebuild"):
        assert n_hash_exchanges(plans[name]) == 1, name
    # duplicated_span_dedup: ONE corpus scan (the one-scan window plan)
    assert len(re.findall(r"\(\d+\) Scan parquet\b", plans["duplicated_span_dedup"])) == 1
    # hybrid_search_rrf: pools via distributed top-k, never a global sort
    assert "TakeOrderedAndProject" in plans["hybrid_search_rrf"]


def test_shingle_filter_not_reinlined_into_predicate(spark):
    """PLANS.md 'filter-below-Project re-inlining': the short-doc drop in
    ngram_shingles must reach the scan as a CHEAP token-count predicate.
    A `size(shingles) > 0` filter above the gram projection gets pushed
    below it with the whole interpreted gram transform substituted into
    the predicate — the text re-splits per element probe per gram per
    row (measured: the sf1 shingle pass alone was 81.6s; the banded
    dedup family 106-217s/entry, now 12-31s). Pin: no Filter node may
    contain the gram builder (concat_ws / element_at)."""
    from mlb_win_predictor_spark.operators.dedup import ngram_shingles
    from mlb_win_predictor_spark.session import load_table

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    plan = ngram_shingles(docs, "text", 3)._jdf.queryExecution().executedPlan().toString()
    filter_lines = [l for l in plan.splitlines() if "Filter" in l]
    assert filter_lines, "short-doc drop disappeared from the plan"
    for l in filter_lines:
        assert "concat_ws" not in l and "element_at" not in l, (
            "gram transform re-inlined into a Filter predicate:\n" + l
        )


def test_knn_grid_vote_reuses_cached_neighbor_join(spark):
    """r4 verdict item #6 (hardened round 6): the 10-point reference
    k-grid must pay for the LSH neighbor join ONCE — each per-k vote's
    plan reads the MATERIALIZED ranking (eager localCheckpoint → Scan
    ExistingRDD), never a fresh parquet scan or LSH bucket join. A
    cache() was only a hint: eviction under memory pressure silently
    re-ran the join per k (measured 66× at 10× data in the full-catalog
    scaling sweep). This mirrors the rank-once shape knn_select_k and
    knn_predict_lsh build on (rank at max(k), checkpoint, vote over
    rn <= k; since r7 select_k derives ALL grid points from the
    checkpoint in one plan — the invariant pinned here is unchanged:
    votes read materialized rows, never the corpus)."""
    from pyspark.sql import functions as F

    from mlb_win_predictor_spark.ml.knn import _ranked_neighbors, _vote
    from mlb_win_predictor_spark.queries.ml import REFERENCE_K_GRID, _emb_features

    df = _emb_features(spark, SF)
    val = df.filter(F.col("vec_id") % 10 == 0)
    train = df.filter(F.col("vec_id") % 10 != 0)
    ranked = _ranked_neighbors(
        train, val, max(REFERENCE_K_GRID), "features_arr", "label", "vec_id",
        2.0, 3, 42,
    ).localCheckpoint(eager=True)
    p = plan_of(_vote(ranked.filter(F.col("rn") <= 5)))
    # the vote executes over the checkpointed rows only: no parquet
    # re-scan, no Generate (the LSH hash-array explode of the bucket
    # join), no InMemoryRelation hint that could silently evict
    assert "Scan ExistingRDD" in p, p
    assert "parquet" not in p.lower(), "vote re-scanned the source"
    assert "Generate" not in p, "vote re-ran the LSH bucket join"


def test_ccnet_buckets_no_single_partition_window(plans):
    """CCNet terciles must ride the range-partitioned dense-index plan
    (same contract as quantile_binning) — a global NTILE sort of the
    corpus would be a one-task stage at 100 TB."""
    p = plans["ccnet_perplexity_buckets"]
    # the only SinglePartition allowed is the single-row corpus-total agg
    # of the unigram LM; the tercile index itself must be a
    # range-partitioned dense index whose row_number window is
    # partition-local (_pid), never a global sort.
    assert_single_execution_dense_index(p, "avg_nll")
    # no NTILE window FUNCTION (the helper's _ntile_idx column is fine)
    assert "ntile(" not in p.lower()


def test_decontaminate_bloom_no_gram_shuffle_join(plans):
    """The Bloom path's corpus side must reach the exact re-check as a
    broadcast join — never a shuffle (sort-merge) join on gram."""
    p = plans["decontaminate_bloom"]
    assert "SortMergeJoin" not in p
    assert "BroadcastHashJoin" in p


def test_decontaminate_bloom_single_arrow_probe_node(plans):
    """r13 (ADVICE r12): ``bloom_might_contain``'s asNondeterministic()
    is a load-bearing optimizer hint — without it,
    InferFiltersFromConstraints copies the pandas-UDF predicate across
    the gram equi-join onto the build side, adding a whole
    ArrowEvalPython stage that probes the very grams the bitset was
    built from (guaranteed-True no-op; r12 plan diff: 2 nodes → 1).
    Pin the shape so a Spark upgrade or a refactor that drops the flag
    (or rejects the non-deterministic UDF) is caught here, not in a
    bench regression."""
    import re

    p = plans["decontaminate_bloom"]
    nodes = re.findall(r"\(\d+\) ArrowEvalPython", p)
    assert len(nodes) == 1, (
        f"expected exactly 1 ArrowEvalPython node (the single Bloom probe "
        f"filter site), found {len(nodes)} — the asNondeterministic() "
        "placement pin no longer holds"
    )


def test_zipf_rank_no_single_partition_window(plans):
    """The vocabulary rank must be the range-partitioned dense index —
    a 10^8-term vocab cannot ride a one-task ROW_NUMBER sort."""
    p = plans["zipf_law_fit"]
    assert_single_execution_dense_index(p, "neg_c")


def test_pagerank_iteration_exchanges_rank_vector_only(spark):
    """SCALE.md's PageRank claim, pinned: the per-iteration contribution
    join re-shuffles ONLY the rank vector — the links table (edges
    pre-joined with out-degree, repartition("src"), persisted) scans as
    an InMemoryTableScan whose HashPartitioning(src) already satisfies
    the join distribution, so the edge side has NO Exchange above the
    cached scan. This is the O(E) vs O(E × iterations) network claim at
    cluster scale. Mirrors the loop body of operators/graph.py::pagerank
    (the loop itself returns a materialized checkpoint, so the invariant
    must be pinned on the constituent plan)."""
    from pyspark.sql import functions as F

    from mlb_win_predictor_spark.session import load_table

    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_partkey").limit(500)
    a, b = li.alias("a"), li.alias("b")
    edges = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") != F.col("b.l_partkey")),
    ).select(F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst"))
    # r8: the links BUILD is pinned to one edge shuffle — repartition
    # ("src") first, then dropDuplicates + window degree, both satisfied
    # by hash(src) with no further Exchange.
    import contextlib
    import io

    from pyspark.sql.window import Window as PRW

    def build_links(e):
        return (
            e.select("src", "dst")
            .repartition("src")
            .dropDuplicates(["src", "dst"])
            .withColumn("deg", F.count(F.lit(1)).over(PRW.partitionBy("src")))
        )

    # count the build's own exchanges on a local-relation edge list (the
    # parquet `edges` above adds input-side limit/broadcast exchanges
    # that belong to the test fixture, not the build)
    synth = spark.createDataFrame(
        [(i % 7, (i * 3) % 7) for i in range(40)], "src long, dst long"
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        build_links(synth).explain("formatted")
    build = buf.getvalue()
    n_build_exchanges = sum(
        1
        for line in build.splitlines()
        if line.strip().startswith("(") and "Exchange" in line
    )
    assert n_build_exchanges == 1, f"links build must be ONE edge shuffle:\n{build}"
    links = build_links(edges).persist()
    try:
        links.count()
        nodes = edges.select(F.col("src").alias("node")).distinct()
        ranks = nodes.select("node", F.lit(0.5).alias("rank"))
        contribs = (
            ranks.join(links, ranks["node"] == links["src"])
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("deg")).alias("contrib"))
        )
        p = plan_of(contribs)
        assert "InMemoryTableScan" in p, p
        # the links (cached) side must flow into the join with no Exchange:
        # every Exchange in the plan belongs to the ranks side or the final
        # dst aggregation, never directly above the InMemoryTableScan.
        lines = p.splitlines()
        scan_op = next(
            l.split(")")[0].split("(")[1] for l in lines if "InMemoryTableScan" in l and "(" in l
        )
        # formatted-plan detail section: find the operator feeding each
        # Exchange; none may be the cached scan
        for i, l in enumerate(lines):
            if "Exchange" in l and "Input [" not in l and "(" in l:
                nxt = lines[i + 1] if i + 1 < len(lines) else ""
                assert f"InMemoryTableScan ({scan_op})" not in nxt, (
                    "links side re-shuffled:\n" + p
                )
    finally:
        links.unpersist()


def test_pagerank_no_dangling_skips_mass_crossjoin(spark):
    """r13: when the graph has NO dangling nodes the per-step dangling
    mass is the constant +0.0, so the loop body must NOT plan the 1-row
    crossJoin (Range scan + BroadcastExchange + BroadcastNestedLoopJoin
    per step that computes nothing). Pinned off the operator's REAL
    pre-checkpoint chain via the `first_chain` witness key — the r13
    loop-body plan dumps (plans/r13/pagerank_copurchase_loop_body_*)
    are this invariant at the entry's scale. A graph WITH a dangling
    node must keep the mass crossJoin (values pinned by the numpy
    oracle test either way)."""
    from mlb_win_predictor_spark.operators.graph import pagerank

    # symmetric (no dangling): every node has an out-edge
    sym = spark.createDataFrame(
        [(0, 1), (1, 0), (1, 2), (2, 1)], "src long, dst long"
    )
    w: dict = {}
    pagerank(sym, iterations=2, tol=None, checkpoint_every=2, witness=w)
    p = plan_of(w["first_chain"])
    assert "BroadcastNestedLoopJoin" not in p, (
        "no-dangling loop body must not crossJoin a constant mass:\n" + p
    )

    # dangling node 3 (no out-edge): the mass term is real and must stay
    dang = spark.createDataFrame([(0, 1), (1, 0), (1, 3)], "src long, dst long")
    w2: dict = {}
    pagerank(dang, iterations=2, tol=None, checkpoint_every=2, witness=w2)
    p2 = plan_of(w2["first_chain"])
    assert "BroadcastNestedLoopJoin" in p2, (
        "dangling-mass crossJoin missing from the dangling-graph loop body:\n" + p2
    )


def test_private_storage_api_smoke(spark):
    """Pin the JVM-private accessors the storage-hygiene layer stands on
    (ADVICE r7): ``persistent_rdd_count`` / ``release_caches`` read
    ``_jsc.sc().getPersistentRDDs()``, and ``release_checkpoint`` reaches
    the RDD behind a localCheckpoint'ed DataFrame via
    ``_jdf.queryExecution().analyzed().rdd()``. ``release_checkpoint``
    swallows failures BY DESIGN (an iteration must not die on a hygiene
    call), so without this test a Spark upgrade that moves the accessor
    would silently revert every iterative operator to GC-paced
    reclamation — here the count assertion makes that failure loud."""
    from pyspark.sql import functions as SF

    from mlb_win_predictor_spark.session import (
        persistent_rdd_count,
        release_caches,
        release_checkpoint,
    )

    release_caches(spark)
    assert persistent_rdd_count(spark) == 0
    ck = spark.range(100).select("id", (SF.col("id") * 2).alias("v")).localCheckpoint(
        eager=True
    )
    assert persistent_rdd_count(spark) == 1, "localCheckpoint did not register"
    release_checkpoint(ck)
    assert persistent_rdd_count(spark) == 0, (
        "release_checkpoint no longer reaches the checkpointed RDD "
        "(queryExecution().analyzed().rdd() moved?)"
    )
    # release_caches catches both persist flavors in one call
    d1 = spark.range(10).persist()
    d1.count()
    d2 = spark.range(20).localCheckpoint(eager=True)
    assert persistent_rdd_count(spark) == 2
    # clearCache releases the DataFrame persist first; the returned count
    # covers the RDD-level registrations (the checkpoint) that remained
    assert release_caches(spark) >= 1
    assert persistent_rdd_count(spark) == 0


def test_llm_pipeline_dsir_plan_shape(plans):
    """Capstone v3: every window keyed (dedup by text, budget by
    source) — a SinglePartition window would mean the importance order
    degraded to a global one-task sort of the corpus; the ≤256-row
    bucket model and 1-row totals reach the weights branch as
    broadcasts; no cartesian (the only nested-loop join allowed is the
    1-row broadcast totals cross)."""
    import re

    p = plans["llm_dataset_pipeline_dsir"]
    lines = p.splitlines()
    n_windows = 0
    for i, line in enumerate(lines):
        if re.match(r"^\(\d+\) Window", line.strip()):
            n_windows += 1
            args = next((l for l in lines[i : i + 5] if "Arguments:" in l), "")
            assert "text" in args or "source" in args, (
                f"unkeyed window: {args[:120]}"
            )
    assert n_windows >= 2, "expected dedup + budget windows"
    # (a SinglePartition exchange legitimately appears — the 1-row
    # model-totals aggregate, same as dsir_budget_selection; the pin is
    # on the WINDOW partition specs, which carry the corpus.)
    assert "BroadcastExchange" in p
    assert "CartesianProduct" not in p
