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

Per merge iteration:
  1. adjacent symbol pairs via slice+arrays_zip+explode (JVM-side, no
     Python);
  2. weighted pair counts (groupBy(left, right).sum — map-side combine);
  3. the argmax pair (ONE row to the driver — bounded state), with a
     deterministic count-desc / lexicographic tie-break so training is
     reproducible across partitionings and engines;
  4. the merge applied to the vocabulary with a native ``F.aggregate``
     fold (greedy left-to-right, the standard BPE application order) —
     gated by an array_contains prefilter so untouched words skip the
     fold;
  5. ``localCheckpoint(eager)`` to keep plan lineage O(1) across
     iterations (same discipline as ``operators.dedup``'s label
     propagation).

Reference parity: the reference repo (763-line tabular ETL,
src/function.py) has no tokenizer; this implements the BASELINE.json
north-star "text analysis / token counting" train side. The
pre-tokenizer split is shared with ``queries.text.token_count_bpe``.
"""

from __future__ import annotations

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


def _apply_merge(vocab: DataFrame, left: str, right: str) -> DataFrame:
    """Rewrite ``syms`` replacing every adjacent (left, right) with the
    merged symbol, greedy left-to-right — a native ``F.aggregate`` fold,
    no Python boundary. Words that don't contain both symbols skip the
    fold entirely (cheap array_contains gate)."""
    s = F.col("syms")
    merged = left + right
    fold = F.aggregate(
        F.slice(s, 2, F.size(s) - 1),
        F.array(F.element_at(s, 1)),
        lambda acc, x: F.when(
            (F.element_at(acc, -1) == F.lit(left)) & (x == F.lit(right)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))),
        ).otherwise(F.concat(acc, F.array(x))),
    )
    gate = F.array_contains(s, left) & F.array_contains(s, right)
    return vocab.withColumn("syms", F.when(gate, fold).otherwise(s))


def bpe_train(
    vocab: DataFrame,
    n_merges: int,
    word_col: str = "word",
    count_col: str = "n",
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

    Driver state is ONE argmax row per iteration + the ``n_merges``-row
    result: safe at any corpus size. Per-iteration cost is two narrow
    passes over the vocabulary and one tiny shuffle on (l, r) keys.
    """
    if n_merges < 1:
        raise ValueError("n_merges must be >= 1")
    cur = to_symbols(vocab, word_col).localCheckpoint(eager=True)
    merges: list[tuple[str, str, str, int]] = []
    for _ in range(n_merges):
        best = (
            _adjacent_pairs(cur, count_col)
            .groupBy("l", "r")
            .agg(F.sum("_n").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("l"), F.asc("r"))
            .first()
        )
        if best is None:
            break
        merges.append((best["l"], best["r"], best["l"] + best["r"], int(best["cnt"])))
        cur = _apply_merge(cur, best["l"], best["r"]).localCheckpoint(eager=True)
    return merges, cur
