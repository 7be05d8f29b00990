"""Train/evaluate/select harness (SURVEY.md §2.8 M1-M10, §3 E3).

Mirrors the reference's modeling.ipynb workload as MLlib pipelines:
StandardScaler -> {LogisticRegression, LinearSVC, GBTClassifier,
NearestCentroid (custom), LSH-kNN (custom)} per feature family, a metrics
leaderboard DataFrame (the evaluate() harness of modeling.ipynb cell 12),
max-by model selection (cells 123-125), and PipelineModel.save + metadata
(cells 129-141, export_models.py).

Documented semantics gaps (SURVEY §7): sklearn SVC is RBF — LinearSVC is
a different hypothesis class (closed by ml.rff: Random Fourier Features
lift + LinearSVC approximates the RBF machine, XOR-separability tested);
randomSplit is probabilistic so 80/20 holds by proportion not exact
count; MLlib StandardScaler uses sample std (ddof=1) vs sklearn's
population std.
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.classification import GBTClassifier, LinearSVC, LogisticRegression
from pyspark.ml.feature import StandardScaler, VectorAssembler
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..pipeline.games import FEATURE_COLS

# M10 — the reference's 3 feature families (modeling.ipynb cells 15/51/87)
FEATURE_FAMILIES: dict[str, list[str]] = {
    "all_stats": FEATURE_COLS,
    "old_school": [
        "pitcher_era_comp",
        "pitcher_win_percentage_comp",
        "pitcher_wins_comp",
        "pitcher_losses_comp",
        "pitcher_innings_pitched_comp",
    ],
    "modern": [
        "pitcher_k_nine_comp",
        "pitcher_bb_nine_comp",
        "pitcher_k_bb_diff_comp",
        "pitcher_whip_comp",
        "pitcher_babip_comp",
        "pitcher_k_bb_ratio_comp",
    ],
}

MODELS: dict[str, Callable[[], object]] = {
    # M3 — sklearn LogisticRegression (modeling.ipynb:370)
    "logistic_regression": lambda: LogisticRegression(
        featuresCol="features", labelCol="label"
    ),
    # M4 — sklearn SVC(RBF); nearest MLlib hypothesis class (gap documented)
    "linear_svc": lambda: LinearSVC(featuresCol="features", labelCol="label"),
    # M7 — HistGradientBoostingClassifier(max_iter=100) -> GBT(maxIter=100)
    # (maxIter trimmed at small SF by caller for runtime)
    "gbt": lambda: GBTClassifier(featuresCol="features", labelCol="label", maxIter=20, seed=42),
}


def make_pipeline(feature_cols: list[str], estimator) -> Pipeline:
    """M1 — VectorAssembler -> StandardScaler(withMean) -> estimator
    (modeling.ipynb cells 7-8: scale-then-fit)."""
    return Pipeline(
        stages=[
            VectorAssembler(inputCols=feature_cols, outputCol="raw_features"),
            StandardScaler(
                inputCol="raw_features", outputCol="features", withMean=True, withStd=True
            ),
            estimator,
        ]
    )


def evaluate_predictions(pred: DataFrame, label_col: str = "label") -> dict[str, float]:
    """M8 — the evaluate() harness (modeling.ipynb:229-252): accuracy /
    precision / recall / F1 from one confusion-matrix aggregation."""
    agg = pred.agg(
        F.sum(((F.col(label_col) == 1) & (F.col("prediction") == 1)).cast("long")).alias("tp"),
        F.sum(((F.col(label_col) == 0) & (F.col("prediction") == 1)).cast("long")).alias("fp"),
        F.sum(((F.col(label_col) == 1) & (F.col("prediction") == 0)).cast("long")).alias("fn"),
        F.sum(((F.col(label_col) == 0) & (F.col("prediction") == 0)).cast("long")).alias("tn"),
    ).collect()[0]
    tp, fp, fn, tn = agg.tp, agg.fp, agg.fn, agg.tn
    total = tp + fp + fn + tn
    prec = tp / (tp + fp) if tp + fp else 0.0
    rec = tp / (tp + fn) if tp + fn else 0.0
    return {
        "accuracy": (tp + tn) / total if total else 0.0,
        "precision": prec,
        "recall": rec,
        "f1": 2 * prec * rec / (prec + rec) if prec + rec else 0.0,
    }


def strip_training_summary(model) -> None:
    """Serialization guard for fitted models (Spark 4 footgun): a fitted
    classifier keeps its training summary, and the summary holds the
    SparkSession. The session's ObservationManager field is instantiated
    lazily by the FIRST ``Dataset.observe()`` call in the session — from
    that point on, any task closure that captures a summary-bearing
    model (every ``model.transform`` prediction UDF) fails to serialize
    with ``NotSerializableException: ObservationManager``. Dropping the
    summary (this engine derives its metrics from predictions, never
    from the summary) makes inference closures session-free.

    Accepts a PipelineModel or a bare classifier model; silently skips
    stages without a summary."""
    from pyspark import SparkContext

    sc = SparkContext._active_spark_context
    if sc is None:
        return
    empty = sc._jvm.scala.Option.apply(None)
    stages = getattr(model, "stages", None) or [model]
    for st in stages:
        jo = getattr(st, "_java_obj", None)
        if jo is not None and st.__class__.__name__.endswith("Model"):
            try:
                jo.setSummary(empty)
            except Exception:
                pass


def train_leaderboard(
    spark: SparkSession,
    features: DataFrame,
    label_col: str = "winning_team",
    families: dict[str, list[str]] | None = None,
    seed: int = 42,
) -> DataFrame:
    """E3 — per (family, model): 80/20 randomSplit(seed=42), fit, predict,
    evaluate; returns the leaderboard as a DataFrame (family, model,
    accuracy, precision, recall, f1, n_train, n_test)."""
    families = families or FEATURE_FAMILIES
    df = features.withColumn("label", F.col(label_col).cast("double")).drop(label_col)
    train, test = df.randomSplit([0.8, 0.2], seed=seed)
    train = train.cache()
    test = test.cache()
    n_train, n_test = train.count(), test.count()
    rows = []
    for fam, cols in families.items():
        for model_name, factory in MODELS.items():
            pipe = make_pipeline(cols, factory())
            fitted = pipe.fit(train)
            strip_training_summary(fitted)
            metrics = evaluate_predictions(fitted.transform(test), "label")
            rows.append(
                {
                    "family": fam,
                    "model": model_name,
                    **{k: float(v) for k, v in metrics.items()},
                    "n_train": n_train,
                    "n_test": n_test,
                }
            )
    train.unpersist()
    test.unpersist()
    return spark.createDataFrame(rows)


def grid_search_cv(
    features: DataFrame,
    feature_cols: list[str] | None = None,
    label_col: str = "winning_team",
    num_folds: int = 5,
    seed: int = 42,
):
    """M6/A9 — grid search with k-fold CV (the reference grid-searches
    KNeighborsClassifier over 10 k values with GridSearchCV(cv=5),
    modeling.ipynb:617-635): ParamGridBuilder + CrossValidator over LR
    regularization, mean CV accuracy per grid point, argmax selection.

    Returns (cv_model, grid_metrics) where grid_metrics is a list of
    (param_value, mean_accuracy) — the reference's per-k accuracy list.
    """
    from pyspark.ml.evaluation import MulticlassClassificationEvaluator
    from pyspark.ml.tuning import CrossValidator, ParamGridBuilder

    feature_cols = feature_cols or FEATURE_FAMILIES["all_stats"]
    df = features.withColumn("label", F.col(label_col).cast("double")).drop(label_col)
    lr = LogisticRegression(featuresCol="features", labelCol="label")
    pipe = make_pipeline(feature_cols, lr)
    grid = (
        ParamGridBuilder()
        .addGrid(lr.regParam, [0.0, 0.01, 0.1, 1.0])
        .build()
    )
    cv = CrossValidator(
        estimator=pipe,
        estimatorParamMaps=grid,
        evaluator=MulticlassClassificationEvaluator(
            labelCol="label", predictionCol="prediction", metricName="accuracy"
        ),
        numFolds=num_folds,
        seed=seed,
        parallelism=4,
    )
    model = cv.fit(df)
    metrics = [
        (pm[lr.regParam], m) for pm, m in zip(grid, model.avgMetrics)
    ]
    return model, metrics


def auc_of(pred: DataFrame, label_col: str = "label") -> float:
    """A7 — areaUnderROC via BinaryClassificationEvaluator
    (the roc_curve+auc of modeling.ipynb:243-244)."""
    from pyspark.ml.evaluation import BinaryClassificationEvaluator

    ev = BinaryClassificationEvaluator(
        labelCol=label_col, rawPredictionCol="rawPrediction", metricName="areaUnderROC"
    )
    return float(ev.evaluate(pred))


def roc_curve_points(pred: DataFrame, label_col: str = "label", n_bins: int = 20) -> DataFrame:
    """A7 — ROC curve points as a DataFrame: thresholds over the positive
    -class probability, (fpr, tpr) per threshold via one aggregation."""
    from pyspark.ml.functions import vector_to_array

    p1 = vector_to_array(F.col("probability")).getItem(1)
    scored = pred.select(F.col(label_col).alias("y"), p1.alias("p"))
    bins = scored.sparkSession.range(n_bins + 1).select(
        (F.col("id").cast("double") / n_bins).alias("thr")
    )
    joined = scored.crossJoin(F.broadcast(bins))
    return (
        joined.groupBy("thr")
        .agg(
            F.sum(((F.col("p") >= F.col("thr")) & (F.col("y") == 1)).cast("long")).alias("tp"),
            F.sum(((F.col("p") >= F.col("thr")) & (F.col("y") == 0)).cast("long")).alias("fp"),
            F.sum(F.col("y").cast("long")).alias("pos"),
            F.sum((1 - F.col("y")).cast("long")).alias("neg"),
        )
        .select(
            "thr",
            (F.col("tp") / F.col("pos")).alias("tpr"),
            (F.col("fp") / F.col("neg")).alias("fpr"),
        )
    )


def select_best(leaderboard: DataFrame) -> DataFrame:
    """M9/A4 — best model per family: max_by(model, accuracy) with a
    deterministic tie-break (modeling.ipynb:1925-1999)."""
    return leaderboard.groupBy("family").agg(
        F.max_by(
            F.col("model"), F.struct(F.col("accuracy"), F.col("model"))
        ).alias("best_model"),
        F.max("accuracy").alias("best_accuracy"),
    )


def save_best_models(
    leaderboard: DataFrame,
    fitted: dict[tuple[str, str], PipelineModel],
    out_dir: str,
) -> None:
    """M9 — PipelineModel.save + metadata JSON (the Spark dual of the
    reference's pickled (model, metadata) tuples, modeling.ipynb cell 141
    + export_models.py:28-38)."""
    best = select_best(leaderboard).collect()
    os.makedirs(out_dir, exist_ok=True)
    for row in best:
        key = (row.family, row.best_model)
        if key in fitted:
            path = os.path.join(out_dir, f"{row.family}__{row.best_model}")
            fitted[key].write().overwrite().save(path)
            with open(path + ".json", "w") as fh:
                json.dump(
                    {
                        "family": row.family,
                        "model": row.best_model,
                        "accuracy": row.best_accuracy,
                    },
                    fh,
                )
