"""Hashed bag-of-words linear quality classifier — the fasttext-style
corpus filter of LLM data pipelines (GPT-3 appendix A / CCNet / DataComp:
train a cheap linear model where the positive class is a curated
reference corpus, score every raw document, keep high scorers).

Spark-first shape: ``HashingTF`` featurization is JVM-side and map-only
(the feature space is a fixed 2^12-dim hash space — no vocabulary build,
no shuffle, unbounded text streams in); ``LogisticRegression`` is
MLlib's distributed L-BFGS (one treeAggregate per iteration over a
corpus that never lands on the driver); scoring is a map-only model
broadcast. At 100 TB the only multi-pass cost is the ~30 training
iterations over the (typically down-sampled) training slice — scoring
the full corpus is a single narrow pass.

Reference parity: the reference trains sklearn classifiers on a
collected pandas frame (modeling/modeling.ipynb); this is the
distributed dual for the text-quality use the driver mandates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NUM_FEATURES = 1 << 12
TRAIN_MOD = 10
TRAIN_BUCKETS = 8  # pmod(xxhash64(doc_id), 10) < 8 → train; rest held out

# positive class = the curated-corpus stand-in: docs passing the
# stopword-density quality gate (the sandbox corpus has no language
# signal — `lang` is assigned independently of the text — so the
# realistic learnable target is distilling the heuristic gate, which is
# exactly the CCNet/fasttext move: label from a reference slice, learn a
# cheap model that generalizes the boundary).
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")
QUALITY_GATE = 0.064  # corpus-median stopword fraction


def _featurize(docs: DataFrame):
    from pyspark.ml.feature import HashingTF, Tokenizer

    tok = Tokenizer(inputCol="text", outputCol="words")
    tf = HashingTF(
        inputCol="words", outputCol="features", numFeatures=NUM_FEATURES
    )
    return tf.transform(tok.transform(docs))


def quality_scores(docs: DataFrame) -> DataFrame:
    """Train on a deterministic hash split (positive = docs passing the
    stopword-density quality gate), score every doc. Returns doc_id,
    split, label, probability-of-positive score, prediction."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.functions import vector_to_array

    toks = F.split(F.trim(F.col("text")), r"\s+")
    # isin = InSet hash probe per token (vs array_contains' linear walk)
    sw_frac = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))).cast(
        "double"
    ) / F.size(toks).cast("double")
    labeled = docs.select(
        "doc_id",
        "text",
        (sw_frac >= QUALITY_GATE).cast("double").alias("label"),
        (F.pmod(F.xxhash64("doc_id"), F.lit(TRAIN_MOD)) < TRAIN_BUCKETS).alias(
            "is_train"
        ),
    )
    feat = _featurize(labeled)
    # maxIter 50→25 + tol 1e-4 (r9): a corpus FILTER does not need 1e-6
    # L-BFGS convergence — at sf1 the fit ran to the 44-iteration wall
    # with held-out accuracy identical (0.988) to the 25-iteration model,
    # and each iteration is a full treeAggregate pass over the train
    # slice (~0.17s at sf1); halving the iteration budget cuts the
    # entry's 10× leg ~30% with no measurable quality change.
    lr = LogisticRegression(
        maxIter=25, tol=1e-4, regParam=1e-2, featuresCol="features", labelCol="label"
    )
    model = lr.fit(feat.filter("is_train"))
    scored = model.transform(feat)
    pos_prob = F.element_at(vector_to_array("probability"), 2)
    return scored.select(
        "doc_id",
        F.when(F.col("is_train"), F.lit("train")).otherwise(F.lit("heldout")).alias(
            "split"
        ),
        F.col("label").cast("long").alias("label"),
        pos_prob.alias("score"),
        F.col("prediction").cast("long").alias("prediction"),
    )


def quality_leaderboard(docs: DataFrame) -> DataFrame:
    """Per-split evaluation summary of ``quality_scores`` (rounded to 3
    decimals so the iterative float path stays row-stable)."""
    s = quality_scores(docs)
    return (
        s.groupBy("split")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("label").cast("long").alias("n_pos"),
            F.round(
                F.avg((F.col("prediction") == F.col("label")).cast("double")), 3
            ).alias("accuracy"),
            F.round(F.avg("score"), 3).alias("mean_score"),
        )
        .orderBy("split")
    )
