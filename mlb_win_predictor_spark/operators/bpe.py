"""Distributed BPE (byte-pair-encoding) merge training.

The classic subword-vocabulary learner (Sennrich, Haddow & Birch 2016,
"Neural Machine Translation of Rare Words with Subword Units") expressed
Spark-first. The key scale decision: training runs at the DISTINCT-WORD
grain weighted by word frequency, never at the corpus grain — the one
corpus-sized pass is the initial word count (one shuffle with map-side
combine), after which every merge iteration touches only the vocabulary
(∝ distinct words, which grows sub-linearly in corpus size by Heaps'
law). That is exactly how the reference tokenizer trainers (subword-nmt,
GPT-2's encoder builder) structure the work, re-expressed as DataFrame
ops so Catalyst handles partial aggregation and AQE sizes the tiny
per-iteration shuffles.

Two trainer paths, split on counted-vocabulary size (r7):
- **driver-local** (vocab fits a bounded budget): after the one
  distributed corpus-grain count, the merge loop runs locally — the
  subword-nmt / GPT-2 encoder-builder structure, and what makes a
  30k-merge production budget feasible (per-merge cost microseconds,
  not a Spark job pair).
- **distributed batched iterations** (over-budget vocabs), per
  iteration:
  1. adjacent symbol pairs via slice+arrays_zip+explode (JVM-side, no
     Python);
  2. weighted pair counts (groupBy(left, right).sum — map-side
     combine) and ONE bounded top-k collect;
  3. the longest provably-sequential-equivalent batch of
     non-conflicting merges (``_select_merge_batch`` — symbol-disjoint,
     fresh merged symbols, strict-count c* bound), deterministic
     count-desc / lexicographic tie-break;
  4. the whole batch applied in ONE native ``F.aggregate`` fold
     (greedy left-to-right, the standard BPE application order; O(batch)
     expression size) — gated by an array_contains prefilter so
     untouched words skip the fold;
  5. ``localCheckpoint(eager)`` to keep plan lineage O(1) across
     iterations, with the PREVIOUS checkpoint explicitly released so
     block-manager storage holds ~1 vocabulary copy (ADVICE r6).

Reference parity: the reference repo (763-line tabular ETL,
src/function.py) has no tokenizer; this implements the BASELINE.json
north-star "text analysis / token counting" train side. The
pre-tokenizer split is shared with ``queries.text.token_count_bpe``.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EOW = "</w>"  # end-of-word marker, per Sennrich et al.


def to_symbols(words: DataFrame, word_col: str = "word") -> DataFrame:
    """Add a ``syms`` column: the word's characters plus the end-of-word
    marker — BPE's initial single-character segmentation."""
    return words.withColumn(
        "syms", F.concat(F.split(F.col(word_col), ""), F.array(F.lit(EOW)))
    )


def _adjacent_pairs(vocab: DataFrame, count_col: str) -> DataFrame:
    """Explode each word's adjacent symbol pairs, carrying the word's
    corpus frequency. All native expressions."""
    s = F.col("syms")
    zipped = F.arrays_zip(
        F.slice(s, 1, F.size(s) - 1).alias("l"),
        F.slice(s, 2, F.size(s) - 1).alias("r"),
    )
    return vocab.select(F.col(count_col).alias("_n"), F.explode(zipped).alias("p")).select(
        F.col("p.l").alias("l"), F.col("p.r").alias("r"), "_n"
    )


def _apply_merges(vocab: DataFrame, pairs: list[tuple[str, str]]) -> DataFrame:
    """Rewrite ``syms`` applying a batch of SYMBOL-DISJOINT merges in ONE
    greedy left-to-right ``F.aggregate`` fold — no Python boundary, and
    O(batch) expression size (a when-chain inside a single fold), unlike
    chaining one fold per merge, whose nested trees blow up Catalyst
    analysis super-linearly in batch length.

    One pass is EXACTLY sequential application for a disjoint batch: no
    two pairs share a symbol, so no application site overlaps another
    pair's, and every merged string is a fresh symbol, so a merge's
    output can never complete another pair. Words containing no
    (left, right) symbol pair skip the fold (array_contains gate)."""
    if not pairs:
        return vocab
    s = F.col("syms")

    def step(acc, x):
        last = F.element_at(acc, -1)
        expr = F.concat(acc, F.array(x))  # default: append
        merged_tail = F.slice(acc, 1, F.size(acc) - 1)
        for left, right in reversed(pairs):
            expr = F.when(
                (last == F.lit(left)) & (x == F.lit(right)),
                F.concat(merged_tail, F.array(F.lit(left + right))),
            ).otherwise(expr)
        return expr

    fold = F.aggregate(
        F.slice(s, 2, F.size(s) - 1), F.array(F.element_at(s, 1)), step
    )
    gate = None
    for left, right in pairs:
        g = F.array_contains(s, left) & F.array_contains(s, right)
        gate = g if gate is None else (gate | g)
    return vocab.withColumn("syms", F.when(gate, fold).otherwise(s))


def _apply_merge(vocab: DataFrame, left: str, right: str) -> DataFrame:
    """Single-merge convenience wrapper over ``_apply_merges``."""
    return _apply_merges(vocab, [(left, right)])


# per-iteration checkpoint release — shared helper (session.py), pinned
# by the private-API smoke test so a Spark upgrade that breaks it is loud
from ..session import release_checkpoint as _release_checkpoint  # noqa: E402


def _select_merge_batch(ranked, symbol_set: set, cap: int):
    """From pair rows ranked (count desc, l asc, r asc), pick the longest
    prefix of merges PROVABLY equivalent to applying them one-at-a-time
    with full recounts between — the batching rule that keeps the
    distributed trainer exactly tied to the sequential Sennrich
    reference (pytest-pinned):

    - members must be pairwise SYMBOL-DISJOINT: merging (A,B) cannot
      change the count of any pair containing neither A nor B;
    - a member's merged string must be a FRESH symbol (not in the
      current vocabulary, not another member's merged string): otherwise
      its occurrences would pool with an existing pair's count;
    - the batch stops at the FIRST row that violates either rule (a
      prefix — skipping over it would reorder the sequential sequence);
    - members after the first must have count STRICTLY ABOVE ``c*``, the
      count at the stop row (or at the truncation horizon of the
      collected list): every pair a merge can create or change is
      bounded by some conflicting pair's old count ≤ c*, so nothing can
      outrank — or tie-and-lexicographically-beat — a member mid-batch.
      (The tie case is the subtle one: a new pair (X, AB) ties member
      p_j only if old (X, A) tied it too, and (X, A) conflicts, so the
      prefix already stopped before p_j.)

    The argmax row (rank 1) is always safe — it IS the sequential pick.
    """
    used: set = set()
    mset: set = set()
    batch = []
    stop_cnt = None
    open_for_batch = True
    for row in ranked:
        m = row.l + row.r
        if not batch:
            # rank 1 IS the sequential pick — always admitted, even if
            # its merged string collides with an existing symbol (then
            # this iteration applies exactly one merge, like sequential)
            batch.append(row)
            used.add(row.l)
            used.add(row.r)
            mset.add(m)
            if m in symbol_set:
                stop_cnt = row.cnt
                break
            continue
        if row.l in used or row.r in used or m in mset:
            stop_cnt = row.cnt
            break
        if open_for_batch:
            if m in symbol_set:
                stop_cnt = row.cnt
                break
            if len(batch) >= cap:
                open_for_batch = False  # keep scanning for the c* bound
            else:
                batch.append(row)
                used.add(row.l)
                used.add(row.r)
                mset.add(m)
    if stop_cnt is not None and batch:
        batch = [batch[0]] + [b for b in batch[1:] if b.cnt > stop_cnt]
    return batch


def segment_word_local(word: str, ranks: dict) -> list[str]:
    """Segment one word with a trained merge table — the GPT-2 encoder's
    apply algorithm: repeatedly merge the LOWEST-RANK adjacent pair
    present. Produces exactly the segmentation in-order merge application
    (and hence training itself) yields, because a later merge can only
    consume symbols earlier merges produced — the equivalence is pinned
    in tests/test_quality.py rather than assumed."""
    syms = list(word) + [EOW]
    while len(syms) > 1:
        best_rank = None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                left, right = syms[i], syms[i + 1]
        if best_rank is None:
            break
        out: list[str] = []
        i = 0
        while i < len(syms):  # greedy left-to-right, the training order
            if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                out.append(left + right)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def bpe_segment_words(
    words: DataFrame,
    merges: list[tuple[str, str, str, int]],
    word_col: str = "word",
) -> DataFrame:
    """Apply a TRAINED merge table to a word table — the serve half of the
    tokenizer (train → ship merges → segment), adding a ``syms`` column.

    The merge table broadcasts as a rank dict (bounded: the trained
    artifact, ≤ vocab-budget entries); segmentation is one Arrow-batched
    map-only pass with per-batch memoization on distinct words — at the
    corpus's word-grain a batch re-segments each distinct word once, so
    cost tracks distinct words per batch, not occurrences. Per-word cost
    is the GPT-2 min-rank loop (O(len·merges-applied)), independent of
    the full merge-table size — what makes a 30k-merge vocabulary
    servable."""
    spark = words.sparkSession
    ranks = {(l, r): i for i, (l, r, _m, _c) in enumerate(merges)}
    ranks_bc = spark.sparkContext.broadcast(ranks)
    eow = EOW

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<string>")
    def _seg(ws: pd.Series) -> pd.Series:
        import pandas as _pd

        rk = ranks_bc.value
        memo: dict = {}

        def seg(word):
            got = memo.get(word)
            if got is None:
                syms = list(word) + [eow]
                while len(syms) > 1:
                    best = None
                    for i in range(len(syms) - 1):
                        r = rk.get((syms[i], syms[i + 1]))
                        if r is not None and (best is None or r < best):
                            best, lft, rgt = r, syms[i], syms[i + 1]
                    if best is None:
                        break
                    out, i = [], 0
                    while i < len(syms):
                        if i + 1 < len(syms) and syms[i] == lft and syms[i + 1] == rgt:
                            out.append(lft + rgt)
                            i += 2
                        else:
                            out.append(syms[i])
                            i += 1
                    syms = out
                memo[word] = got = syms
            return got

        return _pd.Series([seg(w if w is not None else "") for w in ws])

    return words.withColumn("syms", _seg(F.col(word_col)))


def _train_local(
    word_counts: list[tuple[str, int]], n_merges: int
) -> tuple[list[tuple[str, str, str, int]], dict[tuple[str, ...], int]]:
    """Sequential Sennrich-style BPE on a collected vocabulary — the
    driver-side fast path for vocabularies small enough to hold locally.
    Identical contract to the distributed iterations: chars + EOW
    segmentation, weighted adjacent-pair counts, (count desc, l, r)
    argmax, greedy left-to-right application."""
    vocab: dict[tuple[str, ...], int] = {}
    for w, n in word_counts:
        k = tuple(w) + (EOW,)
        vocab[k] = vocab.get(k, 0) + n
    merges: list[tuple[str, str, str, int]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, n in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + n
        if not pairs:
            break
        (left, right), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((left, right, left + right, cnt))
        out_vocab: dict[tuple[str, ...], int] = {}
        for syms, n in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            k = tuple(out)
            out_vocab[k] = out_vocab.get(k, 0) + n
        vocab = out_vocab
    return merges, vocab


def bpe_train(
    vocab: DataFrame,
    n_merges: int,
    word_col: str = "word",
    count_col: str = "n",
    batch_cap: int = 48,
    top_k: int = 4096,
    driver_vocab_cap: int = 65536,
) -> tuple[list[tuple[str, str, str, int]], DataFrame]:
    """Learn ``n_merges`` BPE merges from a (word, count) vocabulary.

    Returns ``(merges, segmented)``: ``merges`` is the ordered list of
    ``(left, right, merged, weighted_pair_count)`` — the trained
    artifact a tokenizer ships — and ``segmented`` the vocabulary with
    its final ``syms`` segmentation (for fertility/compression stats).

    Deterministic: ties on pair count break lexicographically on
    (left, right), so the merge sequence is a pure function of the
    vocabulary. Stops early when no adjacent pair remains (every word
    collapsed to a single symbol).

    MERGE BATCHING (the production-budget fix): instead of one Spark job
    pair per merge, each iteration collects the top-``top_k`` pair
    counts once and applies the longest provably-sequential-equivalent
    prefix of non-conflicting merges (see ``_select_merge_batch`` for
    the exactness argument) in ONE vocabulary pass — the ``batch_cap``
    chained folds pipeline inside a single projection, so a 30k-merge
    tokenizer costs ~merges/batch-size job pairs, not 30k. The batched
    sequence is EXACTLY the sequential one (pytest-pinned against a
    pure-Python Sennrich reference, including on tie-heavy vocabs).

    Driver state is the collected top-k rows per iteration plus the
    symbol-string set (≤ initial charset + n_merges entries — vocabulary
    grain, not corpus grain): safe at any corpus size. Each finished
    iteration releases the previous vocabulary checkpoint, bounding
    block-manager storage to ~1 vocab copy.
    """
    if n_merges < 1:
        raise ValueError("n_merges must be >= 1")
    spark = vocab.sparkSession
    # SMALL-VOCAB FAST PATH: the corpus-grain work — the word count that
    # produced ``vocab`` — is already done upstream; merge learning only
    # touches the counted vocabulary, which by Heaps' law grows
    # sub-linearly in corpus size. When it fits a bounded driver budget,
    # train locally (the subword-nmt / GPT-2 encoder-builder structure:
    # distributed count, local merge loop) — per-merge cost is
    # microseconds instead of a Spark job pair, which is what makes a
    # 30k-merge production budget feasible. The distributed batched
    # iterations below remain the over-budget path and stay exact-tied
    # to this algorithm (both are pytest-pinned against an independent
    # reference).
    if driver_vocab_cap and vocab.limit(driver_vocab_cap + 1).count() <= driver_vocab_cap:
        rows = vocab.select(word_col, count_col).collect()
        merges, seg = _train_local([(r[0], int(r[1])) for r in rows], n_merges)
        seg_df = spark.createDataFrame(
            [(list(k), int(n)) for k, n in seg.items()],
            f"syms array<string>, {count_col} long",
        )
        return merges, seg_df
    cur = to_symbols(vocab, word_col).localCheckpoint(eager=True)
    # the live symbol-string set (fresh-merged-symbol guard): initial
    # distinct characters + EOW — bounded by the charset, tiny
    symbol_set = {
        r.s for r in cur.select(F.explode("syms").alias("s")).distinct().collect()
    }
    merges: list[tuple[str, str, str, int]] = []
    while len(merges) < n_merges:
        ranked = (
            _adjacent_pairs(cur, count_col)
            .groupBy("l", "r")
            .agg(F.sum("_n").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("l"), F.asc("r"))
            .limit(top_k)
            .collect()
        )
        if not ranked:
            break
        batch = _select_merge_batch(ranked, symbol_set, cap=batch_cap)
        if len(ranked) == top_k and len(batch) > 1:
            # the collected list is truncated: uncollected pairs have
            # count ≤ the last collected row's — apply the same strict
            # c* bound against that horizon
            horizon = ranked[-1].cnt
            batch = [batch[0]] + [b for b in batch[1:] if b.cnt > horizon]
        batch = batch[: n_merges - len(merges)]
        for row in batch:
            merges.append((row.l, row.r, row.l + row.r, int(row.cnt)))
            symbol_set.add(row.l + row.r)
        nxt = _apply_merges(cur, [(row.l, row.r) for row in batch])
        prev, cur = cur, nxt.localCheckpoint(eager=True)
        _release_checkpoint(prev)
    return merges, cur
