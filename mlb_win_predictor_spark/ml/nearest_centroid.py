"""NearestCentroid classifier as a pure DataFrame composition.

The reference fits sklearn ``NearestCentroid()`` (modeling/modeling.ipynb:537,
cell 31); MLlib has no equivalent (SURVEY §2.8 M5), so this is a native
operator: fit = one map-side-combined vector aggregation
(``Summarizer.mean``), predict = broadcast nested-loop + struct-min argmin.

100 TB posture: the model is k·d doubles (tiny) — always broadcastable.
Fit shuffles one partial summary per (partition, label); scoring is an
embarrassingly parallel map with NO shuffle (argmin folded into the
per-row array expression, not a window).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.ml.functions import array_to_vector, vector_to_array
from pyspark.ml.stat import Summarizer


@dataclass
class NearestCentroidModel:
    """Fitted centroids: DataFrame (c_label, centroid array<double>)."""

    centroids: DataFrame
    features_col: str
    label_col: str

    def transform(self, df: DataFrame, prediction_col: str = "prediction") -> DataFrame:
        """Assign each row to the nearest centroid by squared L2.

        The centroid set collapses to ONE broadcast row of
        array<struct<label,centroid>>; the argmin runs inside a single
        higher-order-function expression per input row — the scored side
        is never shuffled or grouped.
        """
        packed = self.centroids.agg(
            F.collect_list(F.struct(F.col("c_label"), F.col("centroid"))).alias("cents")
        )
        x = F.col(self.features_col)
        dist_to = lambda c: F.aggregate(  # noqa: E731
            F.zip_with(x, c, lambda xv, cv: (xv.cast("double") - cv) * (xv.cast("double") - cv)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        best = F.aggregate(
            F.col("cents"),
            F.struct(
                F.lit(float("inf")).alias("d"), F.lit(None).cast("long").alias("l")
            ),
            lambda acc, cs: F.when(
                dist_to(cs["centroid"]) < acc["d"],
                F.struct(dist_to(cs["centroid"]).alias("d"), cs["c_label"].alias("l")),
            ).otherwise(acc),
        )
        return df.join(F.broadcast(packed)).select(
            *df.columns, best["l"].alias(prediction_col)
        )


def fit_nearest_centroid(
    train: DataFrame, features_col: str = "features_arr", label_col: str = "label"
) -> NearestCentroidModel:
    """Fit: per-label element-wise mean via ``Summarizer.mean`` (MLlib's
    map-side-combined vector aggregator — shuffle volume is one summary
    per (partition, label), independent of row count)."""
    cent = (
        train.select(
            F.col(label_col).cast("long").alias("c_label"),
            array_to_vector(
                F.transform(F.col(features_col), lambda v: v.cast("double"))
            ).alias("_vec"),
        )
        .groupBy("c_label")
        .agg(Summarizer.mean(F.col("_vec")).alias("mean_vec"))
        .select("c_label", vector_to_array(F.col("mean_vec")).alias("centroid"))
    )
    return NearestCentroidModel(cent, features_col, label_col)
