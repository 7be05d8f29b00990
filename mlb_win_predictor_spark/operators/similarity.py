"""Similarity search operators (SURVEY §2.10): exact baseline + LSH ANN.

``exact_topk_cosine`` is the correctness oracle (broadcast nested-loop —
fine for bounded query sets, never for corpus×corpus). ``ann_topk_lsh``
is the scale path: BucketedRandomProjectionLSH buckets both sides so the
join touches colliding buckets only; recall vs the exact oracle is
property-tested at small SF (tests/test_operators.py).
"""

from __future__ import annotations

from pyspark.ml.feature import BucketedRandomProjectionLSH
from pyspark.ml.functions import array_to_vector
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / F.sqrt(_dot(a, a) * _dot(b, b))


def exact_topk_cosine(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine: broadcast the (small) query side over the
    corpus scan; one window per query id for the final k."""
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    c = corpus.select(F.col(id_col).alias("cand_id"), F.col(vec_col).alias("c_vec"))
    scored = c.join(F.broadcast(q), F.col("query_id") != F.col("cand_id")).select(
        "query_id", "cand_id", cosine(F.col("q_vec"), F.col("c_vec")).alias("cos")
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("cand_id").asc())
    return scored.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= k)


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """IVF (inverted-file) ANN: KMeans partitions the corpus into cells;
    each query probes only its ``n_probe`` nearest cells and exact-reranks
    within them. Scan fraction ~ n_probe/n_cells of the corpus — the
    coarse-quantizer alternative to LSH banding.

    Deterministic given the seed. Recall is property-tested vs the exact
    oracle (tests/test_operators.py).
    """
    from pyspark.ml.clustering import KMeans

    c = corpus.select(
        F.col(id_col).alias("cand_id"), F.col(vec_col).alias("c_vec")
    ).withColumn(
        "_vec", array_to_vector(F.transform(F.col("c_vec"), lambda v: v.cast("double")))
    )
    km = KMeans(k=n_cells, seed=seed, featuresCol="_vec", predictionCol="cell")
    model = km.fit(c)
    assigned = model.transform(c).select("cand_id", "c_vec", "cell")

    # centroid table (tiny) broadcast; per query: n_probe nearest cells
    cents = [(int(i), [float(x) for x in ctr]) for i, ctr in enumerate(model.clusterCenters())]
    cent_df = queries.sparkSession.createDataFrame(cents, ["cell", "centroid"])
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    qc = q.join(F.broadcast(cent_df)).select(
        "query_id",
        "q_vec",
        "cell",
        F.aggregate(
            F.zip_with(
                F.col("q_vec"),
                F.col("centroid"),
                lambda x, c_: (x.cast("double") - c_) * (x.cast("double") - c_),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ).alias("cell_dist"),
    )
    wq = W.partitionBy("query_id").orderBy(F.col("cell_dist").asc(), F.col("cell").asc())
    probes = qc.withColumn("rn", F.row_number().over(wq)).filter(F.col("rn") <= n_probe)

    cand = probes.select("query_id", "q_vec", "cell").join(assigned, "cell").filter(
        F.col("query_id") != F.col("cand_id")
    )
    scored = cand.select(
        "query_id", "cand_id", cosine(F.col("q_vec"), F.col("c_vec")).alias("cos")
    ).dropDuplicates(["query_id", "cand_id"])
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("cand_id").asc())
    return scored.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= k)


def ann_topk_lsh(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_length: float = 2.0,
    num_hash_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k via BucketedRandomProjectionLSH (Euclidean
    buckets as a proxy; vectors are near-unit-norm so L2 order ~ cosine
    order). Join volume ∝ bucket collisions, not |queries|×|corpus|."""
    to_vec = lambda df, idn, alias: df.select(  # noqa: E731
        F.col(id_col).alias(idn),
        F.col(vec_col).alias(alias),
        array_to_vector(
            F.transform(F.col(vec_col), lambda v: v.cast("double"))
        ).alias("_vec"),
    )
    q = to_vec(queries, "query_id", "q_vec")
    c = to_vec(corpus, "cand_id", "c_vec")
    lsh = BucketedRandomProjectionLSH(
        inputCol="_vec",
        outputCol="_hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=seed,
    )
    model = lsh.fit(c)
    joined = model.approxSimilarityJoin(q, c, float("inf"), distCol="_l2")
    pairs = joined.filter(F.col("datasetA.query_id") != F.col("datasetB.cand_id")).select(
        F.col("datasetA.query_id").alias("query_id"),
        F.col("datasetB.cand_id").alias("cand_id"),
        cosine(F.col("datasetA.q_vec"), F.col("datasetB.c_vec")).alias("cos"),
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("cand_id").asc())
    return pairs.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= k)
