"""Approximate k-NN classification via LSH (SURVEY §2.8 M6).

The reference grid-searches sklearn ``KNeighborsClassifier`` (modeling/
modeling.ipynb:617-635). MLlib has no exact kNN; the scalable path is
``BucketedRandomProjectionLSH``: hash both sides, join only colliding
buckets, majority-vote the k nearest (SURVEY §2.8 mapping). At 100 TB the
bucket join replaces the O(n·m) cross product with collision groups.
"""

from __future__ import annotations

from pyspark.ml.feature import BucketedRandomProjectionLSH
from pyspark.ml.functions import array_to_vector
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def knn_predict_lsh(
    train: DataFrame,
    test: DataFrame,
    k: int = 5,
    features_col: str = "features_arr",
    label_col: str = "label",
    id_col: str = "vec_id",
    bucket_length: float = 2.0,
    num_hash_tables: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Returns test rows + ``prediction`` (majority label of ~k approximate
    nearest train neighbors). Deterministic given the seed."""
    to_vec = lambda df: df.withColumn(  # noqa: E731
        "_vec", array_to_vector(F.transform(F.col(features_col), lambda v: v.cast("double")))
    )
    tr, te = to_vec(train), to_vec(test)
    lsh = BucketedRandomProjectionLSH(
        inputCol="_vec",
        outputCol="_hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=seed,
    )
    model = lsh.fit(tr)
    # bucket-join candidates within a generous radius, keep k per test row
    joined = model.approxSimilarityJoin(te, tr, float("inf"), distCol="_dist")
    pairs = joined.select(
        F.col(f"datasetA.{id_col}").alias("test_id"),
        F.col(f"datasetB.{label_col}").alias("n_label"),
        F.col(f"datasetB.{id_col}").alias("n_id"),
        F.col("_dist"),
    )
    wk = W.partitionBy("test_id").orderBy(F.col("_dist").asc(), F.col("n_id").asc())
    topk = pairs.withColumn("rn", F.row_number().over(wk)).filter(F.col("rn") <= k)
    votes = topk.groupBy("test_id", "n_label").agg(
        F.count(F.lit(1)).alias("votes"), F.min("_dist").alias("min_dist")
    )
    wv = W.partitionBy("test_id").orderBy(
        F.col("votes").desc(), F.col("min_dist").asc(), F.col("n_label").asc()
    )
    pred = (
        votes.withColumn("rn", F.row_number().over(wv))
        .filter(F.col("rn") == 1)
        .select("test_id", F.col("n_label").alias("prediction"))
    )
    return test.join(pred, test[id_col] == pred.test_id, "left").drop("test_id")
