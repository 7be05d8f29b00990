"""Data-quality constraint checker + per-group model fit tests."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from mlb_win_predictor_spark.operators.quality import (
    check_constraints,
    in_range,
    matches,
    not_null,
    one_of,
    unique_key_violations,
    violating_rows,
)
from mlb_win_predictor_spark.session import load_table

SF = "/root/testdata/sf0.001"


def test_check_constraints_single_pass(spark):
    li = load_table(spark, SF, "lineitem")
    rules = [
        not_null("l_orderkey"),
        in_range("l_discount", 0.0, 0.1),
        in_range("l_quantity", 1.0, 50.0),
        one_of("l_returnflag", ["A", "N", "R"]),
        matches("l_linestatus", "^[OF]$"),
    ]
    out = {r.rule: (r.violations, r.violation_rate) for r in check_constraints(li, rules).collect()}
    assert len(out) == 5
    # clean synthetic data: no violations anywhere
    assert all(v == 0 for v, _ in out.values())

    # plant violations and see them counted + extracted
    dirty = li.limit(10).select(
        F.lit(None).cast("long").alias("l_orderkey"),
        F.lit(0.5).alias("l_discount"),
        F.lit(5.0).alias("l_quantity"),
        F.lit("X").alias("l_returnflag"),
        F.lit("Z").alias("l_linestatus"),
    )
    mixed = li.select(
        "l_orderkey", "l_discount", "l_quantity", "l_returnflag", "l_linestatus"
    ).unionByName(dirty)
    out2 = {r.rule: r.violations for r in check_constraints(mixed, rules).collect()}
    assert out2["l_orderkey_not_null"] == 10
    assert out2["l_discount_in_range"] == 10
    assert out2["l_returnflag_one_of"] == 10
    assert out2["l_linestatus_matches"] == 10
    assert out2["l_quantity_in_range"] == 0
    bad = violating_rows(mixed, rules)
    assert bad.count() == 10
    assert set(bad.first().broken_rules) == {
        "l_orderkey_not_null",
        "l_discount_in_range",
        "l_returnflag_one_of",
        "l_linestatus_matches",
    }


def test_observe_constraints_piggybacks_on_action(spark, tmp_path):
    from mlb_win_predictor_spark.operators.quality import observe_constraints

    li = load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_discount", "l_quantity"
    )
    rules = [
        not_null("l_orderkey"),
        in_range("l_discount", 0.0, 0.1),
        in_range("l_quantity", 1.0, 50.0),
    ]
    observed, obs = observe_constraints(li, rules, name="dq_test")
    # the metrics ride the write action — no separate aggregation scan
    observed.write.mode("overwrite").parquet(str(tmp_path / "out"))
    got = obs.get
    assert got["_total"] == li.count()
    assert got["l_orderkey_not_null"] == 0
    assert got["l_discount_in_range"] == 0
    assert got["l_quantity_in_range"] == 0


def test_unique_key_violations(spark):
    o = load_table(spark, SF, "orders")
    assert unique_key_violations(o, ["o_orderkey"]).count() == 0
    dup = o.limit(7)
    assert unique_key_violations(o.unionByName(dup), ["o_orderkey"]).count() == 7


def test_fit_linear_per_group_matches_numpy(spark):
    from mlb_win_predictor_spark.ml.per_group import fit_linear_per_group

    rng = np.random.default_rng(7)
    rows = []
    truth = {"a": (1.0, 2.0, -3.0), "b": (-5.0, 0.5, 4.0)}
    for g, (b0, b1, b2) in truth.items():
        for _ in range(200):
            x1, x2 = rng.uniform(-5, 5), rng.uniform(-5, 5)
            noise = rng.normal(0, 0.01)
            rows.append((g, float(x1), float(x2), float(b0 + b1 * x1 + b2 * x2 + noise)))
    df = spark.createDataFrame(rows, "grp string, x1 double, x2 double, y double")
    out = {r.grp: r for r in fit_linear_per_group(df, "grp", ["x1", "x2"], "y").collect()}
    for g, (b0, b1, b2) in truth.items():
        got = out[g]
        assert got.n_rows == 200
        assert got.coef == pytest.approx([b0, b1, b2], abs=0.01)
        assert got.rmse < 0.05
    # degenerate group: too few rows -> null coefficients, no crash
    tiny = spark.createDataFrame([("c", 1.0, 2.0, 3.0)], "grp string, x1 double, x2 double, y double")
    r = fit_linear_per_group(tiny, "grp", ["x1", "x2"], "y").collect()[0]
    assert r.coef is None and r.n_rows == 1


def test_quality_filter_funnel_conserves_documents(spark):
    """Funnel invariants: marginal kills sum to docs − survivors; each
    rule's marginal kills never exceed its total failures; survivors are
    non-increasing along the chain; the last survivor count equals the
    docs passing ALL rules."""
    from mlb_win_predictor_spark.queries.text import quality_filter_funnel

    rows = {r.rule_idx: r for r in quality_filter_funnel(spark, SF).collect()}
    assert sorted(rows) == [1, 2, 3, 4]
    n_docs = load_table(spark, SF, "documents").count()
    killed = sum(r.n_killed_here for r in rows.values())
    final_survivors = rows[4].n_surviving_after
    assert killed == n_docs - final_survivors
    surv = [rows[i].n_surviving_after for i in sorted(rows)]
    assert surv == sorted(surv, reverse=True), surv
    for r in rows.values():
        assert 0 <= r.n_killed_here <= r.n_failed_total
    # chain step identity: survivors drop by exactly the marginal kills
    prev = n_docs
    for i in sorted(rows):
        assert rows[i].n_surviving_after == prev - rows[i].n_killed_here
        prev = rows[i].n_surviving_after


def test_ngram_containment_bounds_and_detects_planted_subset(spark, tmp_path):
    """Containment ∈ (0,1]; a planted doc that is a verbatim SUBSTRING of
    another must surface with containment 1.0 in the small→large
    direction even though Jaccard is far below the near-dup threshold."""
    import pandas as pd

    from mlb_win_predictor_spark.queries.text import (
        CONTAINMENT_THRESHOLD,
        ngram_containment_pairs,
    )

    base = load_table(spark, SF, "documents").toPandas()
    long_text = " ".join(f"w{i}" for i in range(60))
    quote = " ".join(f"w{i}" for i in range(20, 32))  # 12-token excerpt
    planted = pd.concat(
        [
            base,
            pd.DataFrame(
                {
                    "doc_id": [100000, 100001],
                    "text": [long_text, quote],
                    "lang": ["en", "en"],
                    "source": ["t", "t"],
                    "n_chars": [len(long_text), len(quote)],
                }
            ),
        ]
    )
    # containment scans doc_id < NGRAM_DOC_CAP, so remap the plants low
    planted.loc[planted.doc_id == 100000, "doc_id"] = 198
    planted.loc[planted.doc_id == 100001, "doc_id"] = 199
    p = str(tmp_path / "documents.parquet")
    planted.to_parquet(p, index=False)
    out = ngram_containment_pairs(spark, str(tmp_path)).collect()
    for r in out:
        assert 0.0 < r.containment_a_in_b <= 1.0
        assert 0.0 < r.containment_b_in_a <= 1.0
        assert max(r.containment_a_in_b, r.containment_b_in_a) >= CONTAINMENT_THRESHOLD
    pair = {(r.doc_a, r.doc_b): r for r in out}.get((198, 199))
    assert pair is not None, "planted subset pair not detected"
    assert pair.containment_b_in_a == 1.0  # the quote is fully inside
    assert pair.containment_a_in_b < 0.25  # and Jaccard-style symmetry fails


def _docs_only_con(parquet_path):
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{parquet_path}')"
    )
    return con


def test_ngram_pairs_survive_sub_ngram_docs(spark, tmp_path):
    """Regression (r5 advice): docs with fewer than NGRAM_N tokens made
    sequence(1, size-2) count DOWN to [1, 0] and slice(toks, 0, 3) throw
    on Spark, while DuckDB's range() returned an empty list — a runtime
    crash AND an engine divergence. Both ngram pair entries must now run
    on a corpus with 0/1/2-token docs and value-match the DuckDB dual."""
    import pandas as pd

    from mlb_win_predictor_spark.queries.text import (
        NGRAM_CONTAINMENT_SQL,
        NGRAM_JACCARD_SQL,
        ngram_containment_pairs,
        ngram_jaccard_pairs,
    )
    from tests.oracle import compare

    base = load_table(spark, SF, "documents").toPandas()
    shorts = pd.DataFrame(
        {
            "doc_id": [190, 191, 192, 193],
            "text": ["", "one", "two tokens", "now three tokens"],
            "lang": ["en"] * 4,
            "source": ["t"] * 4,
            "n_chars": [0, 3, 10, 16],
        }
    )
    planted = pd.concat([base[~base.doc_id.isin(shorts.doc_id)], shorts])
    p = str(tmp_path / "documents.parquet")
    planted.to_parquet(p, index=False)
    con = _docs_only_con(p)
    compare(ngram_jaccard_pairs(spark, str(tmp_path)), con, NGRAM_JACCARD_SQL)
    compare(ngram_containment_pairs(spark, str(tmp_path)), con, NGRAM_CONTAINMENT_SQL)


def test_bigram_logprob_survives_single_token_docs(spark, tmp_path):
    """Regression (r5): a 1-token doc must yield no bigrams (and drop from
    the report) rather than crash the map-side bigram transform; the
    DuckDB dual (generate_series(1,0) = empty) must still value-match."""
    import pandas as pd

    from mlb_win_predictor_spark.queries.text import (
        BIGRAM_LOGPROB_SQL,
        bigram_logprob_quality,
    )
    from tests.oracle import compare

    base = load_table(spark, SF, "documents").toPandas()
    shorts = pd.DataFrame(
        {
            "doc_id": [990001, 990002],
            "text": ["solo", "pair up"],
            "lang": ["en"] * 2,
            "source": ["t"] * 2,
            "n_chars": [4, 7],
        }
    )
    planted = pd.concat([base, shorts])
    p = str(tmp_path / "documents.parquet")
    planted.to_parquet(p, index=False)
    con = _docs_only_con(p)
    out = bigram_logprob_quality(spark, str(tmp_path))
    assert out.filter(F.col("doc_id") == 990001).count() == 0  # no bigrams
    assert out.filter(F.col("doc_id") == 990002).count() == 1
    compare(out, con, BIGRAM_LOGPROB_SQL)


def test_ccnet_buckets_properties(spark):
    """Tercile sizes differ by at most 1; head keeps everything; kept
    counts never exceed bucket size; nll bands are ordered
    head <= middle <= tail."""
    from mlb_win_predictor_spark.queries.text import ccnet_perplexity_buckets

    rows = {r.bucket: r for r in ccnet_perplexity_buckets(spark, SF).collect()}
    assert set(rows) == {"head", "middle", "tail"}
    sizes = [r.n_docs for r in rows.values()]
    assert max(sizes) - min(sizes) <= 1
    assert rows["head"].n_kept == rows["head"].n_docs
    for r in rows.values():
        assert 0 <= r.n_kept <= r.n_docs
    assert rows["head"].max_nll <= rows["middle"].min_nll
    assert rows["middle"].max_nll <= rows["tail"].min_nll


def test_compression_ratio_orders_repetitive_below_random(spark):
    """The zlib quality signal must rank a highly repetitive doc well
    below a unique-token doc, sit in (0, ~1.2], and agree with a direct
    Python zlib computation on a sampled doc."""
    import zlib

    from mlb_win_predictor_spark.functions.pandas_fns import compression_ratio

    rows = [
        (0, "spam " * 200),                       # repetitive
        (1, " ".join(f"u{i}" for i in range(200))),  # unique tokens
        (2, None),                                # missing doc: NULL out
        (3, ""),                                  # empty: neutral 1.0
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in compression_ratio(df, "doc_id", "text").collect()}
    assert out[0].compression_ratio < out[1].compression_ratio / 2
    for r in (out[0], out[1]):
        assert 0.0 < r.compression_ratio <= 1.2
    raw = rows[1][1].encode()
    expect = len(zlib.compress(raw, 6)) / len(raw)
    assert abs(out[1].compression_ratio - expect) < 1e-12
    # ADVICE r5: null text must stay NULL (not masquerade as 1.0, not
    # blow up the Arrow batch via the NaN object-dtype fallback)
    assert out[2].compression_ratio is None
    assert out[3].compression_ratio == 1.0


def test_llm_dataset_pipeline_stage_monotonicity(spark):
    """The composed curation flow's per-source counts must shrink
    monotonically through the stages, the budget must bind (tokens_final
    <= budget, with real attrition somewhere), and the quality stage
    must actually drop docs (non-vacuity)."""
    from mlb_win_predictor_spark.queries.text import (
        LLM_PIPE_BUDGET,
        llm_dataset_pipeline,
    )

    rows = llm_dataset_pipeline(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.n_input >= r.n_quality >= r.n_dedup >= r.n_clean >= r.n_final, r
        assert r.tokens_final <= LLM_PIPE_BUDGET, r
    assert sum(r.n_input - r.n_quality for r in rows) > 0, "quality stage vacuous"
    assert sum(r.n_clean - r.n_final for r in rows) > 0, "budget stage vacuous"


def test_llm_pipeline_neardup_removes_planted_paraphrase(spark, tmp_path):
    """Capstone v2 (r5 verdict item #3): a planted PARAPHRASE — different
    text bytes, 3-gram Jaccard ~0.87 — must survive v1's exact-dedup
    stage (proving the exact stage misses it) and be removed by v2's
    near-dedup stage, with every other stage's attrition byte-identical
    between the variants and monotone through all six counters."""
    import pandas as pd

    from mlb_win_predictor_spark.queries.text import (
        llm_dataset_pipeline,
        llm_dataset_pipeline_neardup,
    )

    words = (
        "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
        "kilo lima mike november oscar papa quebec romeo sierra tango "
        "uniform victor whiskey xray yankee zulu ocean river stone cloud"
    )
    para = words.rsplit(" ", 2)[0] + " pebble mist"  # last 2 tokens differ
    text_b = " ".join(f"item{i} thing{i}" for i in range(15))
    contaminated = (
        "plain honest words around the leaked run cont1 cont2 cont3 cont4 "
        "cont5 then more ordinary filler tokens carry this document past "
        "the twenty token quality floor easily"
    )
    bench = "benchmark prompt cont1 cont2 cont3 cont4 cont5 answer keys here"
    rows = [
        (1, words, "web"),          # canonical; survives everything
        (2, para, "web"),           # planted paraphrase: ONLY v2 drops it
        (3, words, "web"),          # exact duplicate: v1 AND v2 drop it
        (4, "too short", "web"),    # quality-gate drop
        (5, text_b, "web"),         # unrelated survivor
        (6, contaminated, "web"),   # decontamination drop (shares a 5-gram)
        (97, bench, "bench"),       # doc_id % 97 == 0: the eval slice
    ]
    pd.DataFrame(rows, columns=["doc_id", "text", "source"]).to_parquet(
        str(tmp_path / "documents.parquet")
    )
    sf_dir = str(tmp_path)
    v2 = {r.source: r for r in llm_dataset_pipeline_neardup(spark, sf_dir).collect()}
    w = v2["web"]
    assert (w.n_input, w.n_quality, w.n_dedup, w.n_neardup, w.n_clean, w.n_final) == (
        6, 5, 4, 3, 2, 2,
    ), w
    assert (
        w.n_input >= w.n_quality >= w.n_dedup >= w.n_neardup >= w.n_clean >= w.n_final
    )
    v1 = {r.source: r for r in llm_dataset_pipeline(spark, sf_dir).collect()}
    w1 = v1["web"]
    # exact stage provably misses the paraphrase: v1 keeps it clean
    assert w1.n_dedup == w.n_dedup == 4
    assert w1.n_clean == 3 and w.n_clean == 2
    # shared stages identical across variants
    assert (w1.n_input, w1.n_quality, w1.n_dedup) == (w.n_input, w.n_quality, w.n_dedup)


def test_llm_pipeline_neardup_monotone_on_testdata(spark):
    """The v2 catalog entry over the driver's documents table: rows per
    source, all six counters monotone, budget binds."""
    from mlb_win_predictor_spark.queries.text import (
        LLM_PIPE_BUDGET,
        llm_dataset_pipeline_neardup,
    )

    rows = llm_dataset_pipeline_neardup(spark, SF).collect()
    assert rows
    for r in rows:
        assert (
            r.n_input >= r.n_quality >= r.n_dedup >= r.n_neardup >= r.n_clean >= r.n_final
        ), r
        assert r.tokens_final <= LLM_PIPE_BUDGET, r


def _bpe_reference(word_counts, n_merges):
    """Pure-Python Sennrich-style BPE trainer — the independent oracle for
    operators.bpe.bpe_train. Same contract: chars + '</w>' initial
    segmentation, weighted adjacent-pair counts, argmax with
    count-desc / (left, right)-lexicographic tie-break, greedy
    left-to-right merge application."""
    vocab = {tuple(w) + ("</w>",): n for w, n in word_counts.items()}
    merges = []
    for _ in range(n_merges):
        pairs = {}
        for syms, n in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + n
        if not pairs:
            break
        (l, r), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((l, r, l + r, cnt))
        new_vocab = {}
        for syms, n in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + n
        vocab = new_vocab
    return merges, vocab


def test_bpe_train_matches_pure_python_reference(spark):
    """The distributed trainer must reproduce the reference BPE merge
    sequence EXACTLY — merges, order, and weighted pair counts — on a
    vocabulary with deliberate count ties (exercising the lexicographic
    tie-break) and overlapping-pair words (exercising greedy
    left-to-right application: 'aaaa' + (a,a) segments as [aa][aa], so
    the (a,a) count of 'aaaa' is 3 before merging but [aa,aa] after)."""
    from mlb_win_predictor_spark.operators.bpe import bpe_train

    counts = {
        "lower": 5, "lowest": 3, "newer": 6, "wider": 2,
        "aaaa": 4, "aab": 4, "zz": 7, "zzz": 1,
    }
    ref_merges, ref_vocab = _bpe_reference(counts, 8)
    words = spark.createDataFrame(list(counts.items()), "word string, n long")
    # BOTH trainer paths must tie the reference exactly: the driver-local
    # fast path (default; taken when the counted vocab fits the budget)
    # and the distributed batched iterations (driver_vocab_cap=0 forces
    # them; batch_cap>1 exercises multi-merge batches).
    for kwargs in (
        {},
        {"driver_vocab_cap": 0, "batch_cap": 1},
        {"driver_vocab_cap": 0, "batch_cap": 48},
    ):
        got_merges, seg = bpe_train(words, n_merges=8, **kwargs)
        assert got_merges == ref_merges, (kwargs, got_merges, ref_merges)
        got_vocab = {
            tuple(r.syms): r.n for r in seg.select("syms", "n").collect()
        }
        assert got_vocab == ref_vocab, kwargs


def test_bpe_batched_matches_sequential_on_tie_heavy_vocab(spark):
    """The merge-BATCHING rule (operators.bpe._select_merge_batch) must
    be invisible: on a small-alphabet random vocabulary dense with count
    ties, overlapping pairs, and batch conflicts, the distributed
    batched path reproduces the sequential reference merge list exactly,
    to saturation, at several batch caps."""
    import random

    from mlb_win_predictor_spark.operators.bpe import bpe_train

    rng = random.Random(7)
    counts = {}
    for _ in range(120):
        w = "".join(rng.choice("abcd") for _ in range(rng.randint(1, 7)))
        counts[w] = counts.get(w, 0) + rng.randint(1, 4)
    for w in ("aaaa", "ababab", "abcabc", "aabb"):
        counts[w] = 5
    ref_merges, _ = _bpe_reference(counts, 60)
    words = spark.createDataFrame(list(counts.items()), "word string, n long")
    for cap in (2, 48):
        got, _ = bpe_train(
            words, n_merges=60, driver_vocab_cap=0, batch_cap=cap
        )
        assert got == ref_merges, f"cap={cap}: diverged"


def test_bpe_apply_matches_training_segmentation(spark):
    """The serve path (segment_word_local / bpe_segment_words, GPT-2-style
    min-rank apply) must reproduce EXACTLY (a) in-order application of
    the merge list and (b) the trainer's own final segmentation of every
    training word — the classic train/apply equivalence, pinned instead
    of assumed, on a tie-heavy vocabulary."""
    import random

    from mlb_win_predictor_spark.operators.bpe import (
        EOW,
        bpe_segment_words,
        bpe_train,
        segment_word_local,
    )

    rng = random.Random(3)
    counts = {}
    for _ in range(150):
        w = "".join(rng.choice("abcd") for _ in range(rng.randint(1, 8)))
        counts[w] = counts.get(w, 0) + rng.randint(1, 4)
    words = spark.createDataFrame(list(counts.items()), "word string, n long")
    merges, seg = bpe_train(words, n_merges=40)
    ranks = {(l, r): i for i, (l, r, _m, _c) in enumerate(merges)}

    def apply_in_order(word):
        syms = list(word) + [EOW]
        for left, right, merged, _c in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    train_seg = {}
    for r in seg.collect():
        # local path returns (syms, n); map back via the joined word
        train_seg["".join(r.syms).removesuffix(EOW)] = list(r.syms)
    dist_seg = {
        r.word: list(r.syms)
        for r in bpe_segment_words(words.select("word"), merges).collect()
    }
    for w in counts:
        expected = apply_in_order(w)
        assert segment_word_local(w, ranks) == expected, w
        assert dist_seg[w] == expected, w
        # the trainer's own segmentation of this word (training IS
        # in-order application)
        assert train_seg["".join(expected).removesuffix(EOW)] == expected


def test_bpe_checkpoint_storage_bounded(spark):
    """Each training iteration must release the previous vocabulary
    checkpoint (ADVICE r6): after training, executor storage holds at
    most the final segmentation — not one copy per iteration."""
    from mlb_win_predictor_spark.operators.bpe import bpe_train
    from mlb_win_predictor_spark.session import (
        persistent_rdd_count,
        release_caches,
    )

    release_caches(spark)
    counts = {"lower": 5, "newer": 6, "wider": 2, "aaaa": 4}
    words = spark.createDataFrame(list(counts.items()), "word string, n long")
    _, seg = bpe_train(words, n_merges=10, driver_vocab_cap=0, batch_cap=1)
    assert seg.count() >= 1
    # sequential path ran >= 2 iterations; only the LAST checkpoint may
    # remain registered
    assert persistent_rdd_count(spark) <= 1
    release_caches(spark)


@pytest.mark.skipif(
    not __import__("os").environ.get("RUN_SLOW"),
    reason="1000-merge distributed BPE storage audit (~3 min): set RUN_SLOW=1",
)
def test_bpe_checkpoint_storage_bounded_at_production_budget(spark):
    """r7 verdict #1 done-criterion: a PRODUCTION merge budget (1000
    merges, forced onto the distributed path) must hold block-manager
    storage at ~1 vocabulary copy THROUGHOUT training, not just at the
    end — sampled after every per-iteration release by wrapping the
    shared ``release_checkpoint`` helper. Without the release, storage
    grows one checkpoint per iteration (~300 iterations here) between
    GC cycles."""
    import random
    import string

    from mlb_win_predictor_spark.operators import bpe
    from mlb_win_predictor_spark.session import (
        persistent_rdd_count,
        release_caches,
    )

    release_caches(spark)
    rnd = random.Random(11)
    words = {
        "".join(rnd.choices(string.ascii_lowercase, k=rnd.randint(4, 16)))
        for _ in range(20000)
    }
    vocab = spark.createDataFrame(
        [(w, rnd.randint(1, 100)) for w in sorted(words)], "word string, n long"
    )
    samples: list[int] = []
    orig = bpe._release_checkpoint

    def sampling(df):
        orig(df)
        samples.append(persistent_rdd_count(spark))

    bpe._release_checkpoint = sampling
    try:
        merges, seg = bpe.bpe_train(vocab, n_merges=1000, driver_vocab_cap=0)
    finally:
        bpe._release_checkpoint = orig
    assert len(merges) == 1000
    assert len(samples) >= 20, "expected many distributed iterations"
    # after every release exactly the current vocabulary checkpoint remains
    assert max(samples) <= 1, f"storage accumulated: {max(samples)} RDDs pinned"
    assert persistent_rdd_count(spark) <= 1  # the returned final segmentation
    assert seg.count() > 0
    release_caches(spark)


def test_bpe_greedy_fold_and_stop_conditions(spark):
    """_apply_merge is greedy left-to-right ('aaa' + (a,a) → [aa, a], not
    [a, aa]); training stops early once every word is a single symbol;
    n_merges < 1 is rejected."""
    import pytest as _pytest

    from mlb_win_predictor_spark.operators.bpe import (
        _apply_merge,
        bpe_train,
        to_symbols,
    )

    df = to_symbols(
        spark.createDataFrame([("aaa", 1)], "word string, n long")
    )
    out = _apply_merge(df, "a", "a").select("syms").first().syms
    assert out == ["aa", "a", "</w>"]

    words = spark.createDataFrame([("ab", 2)], "word string, n long")
    merges, seg = bpe_train(words, n_merges=50)  # far more than needed
    # 'ab</w>' needs exactly 2 merges to collapse to one symbol
    assert [m[2] for m in merges] == ["ab", "ab</w>"]
    assert seg.first().syms == ["ab</w>"]

    with _pytest.raises(ValueError, match="n_merges"):
        bpe_train(words, n_merges=0)


def test_llm_pipeline_dsir_shares_stages_and_binds_budget(spark):
    """Capstone v3 (r10): the DSIR-ordered budget variant must agree
    with v1 on every SHARED stage (input, quality, dedup, decontam —
    the ordering only changes WHICH clean docs the budget admits), keep
    all counters monotone, and bind the budget. The ordering itself is
    pinned exactly by the DuckDB oracle (the importance CTEs inlined in
    LLM_PIPELINE_DSIR_SQL); this test pins the composition contract."""
    from mlb_win_predictor_spark.queries.text import (
        LLM_PIPE_BUDGET,
        llm_dataset_pipeline,
        llm_dataset_pipeline_dsir,
    )

    v3 = {r.source: r for r in llm_dataset_pipeline_dsir(spark, SF).collect()}
    v1 = {r.source: r for r in llm_dataset_pipeline(spark, SF).collect()}
    assert set(v3) == set(v1) and v3
    for s, r in v3.items():
        r1 = v1[s]
        assert (r.n_input, r.n_quality, r.n_dedup, r.n_clean) == (
            r1.n_input, r1.n_quality, r1.n_dedup, r1.n_clean,
        ), (s, r, r1)
        assert r.n_input >= r.n_quality >= r.n_dedup >= r.n_clean >= r.n_final, r
        assert r.tokens_final <= LLM_PIPE_BUDGET, r
    assert sum(r.n_clean - r.n_final for r in v3.values()) > 0, "budget vacuous"
    # the orderings genuinely differ: at least one source admits a
    # different doc set (token totals differ) under importance order
    assert any(
        v3[s].tokens_final != v1[s].tokens_final
        or v3[s].n_final != v1[s].n_final
        for s in v3
    ), "DSIR order indistinguishable from hash order on the corpus"
