"""Similarity-search catalog over ``embeddings`` (SURVEY.md §2.10).

Brute-force cosine top-k is the exactness baseline (oracle-checked here);
the scale path is LSH bucketing (``operators.similarity``, rows-only
entries) — at 100 TB you never cross-join the corpus, you band it.

Numeric determinism: every element is cast float->double *before*
multiplication on both engines (float-precision multiply then widen is a
different value), and accumulated dot/norm/distance values are rounded to
6dp because the two engines fold the 64-dim sum in different orders
(~1e-13 relative fuzz, far below the rounding grain).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..functions.scalars import stable_round
from ..session import load_table
from .base import QueryDef

TOPK_N_QUERIES = 8
TOPK_K = 3
NEARDUP_CAP = 500
NEARDUP_MIN_COS = 0.3
CENTROID_ASSIGN_CAP = 300


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / F.sqrt(_dot(a, a) * _dot(b, b))


def cosine_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k ANN baseline: for each query vector
    (vec_id < {nq}), the {k} nearest candidates by cosine. The query side
    broadcasts; the candidate scan streams — a map-side nested-loop with
    no shuffle until the final per-query top-k."""
    e = load_table(spark, sf_dir, "embeddings")
    # norms computed ONCE per vector before the join (the pairwise loop
    # would otherwise re-fold dot(v,v) per pair — 3x the HOF work);
    # bit-identical to inline _cosine since the fold ops are the same
    q = e.filter(F.col("vec_id") < TOPK_N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        _dot(F.col("embedding"), F.col("embedding")).alias("q_nrm"),
    )
    c = e.filter(F.col("vec_id") >= TOPK_N_QUERIES).select(
        F.col("vec_id").alias("cand_id"),
        F.col("embedding").alias("c_emb"),
        _dot(F.col("embedding"), F.col("embedding")).alias("c_nrm"),
    )
    scored = c.join(F.broadcast(q)).select(
        "query_id",
        "cand_id",
        stable_round(
            _dot(F.col("q_emb"), F.col("c_emb"))
            / F.sqrt(F.col("q_nrm") * F.col("c_nrm")),
            6,
        ).alias("cosine"),
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("cand_id").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOPK_K)
        .select("query_id", F.col("rnk").cast("long").alias("rnk"), "cand_id", "cosine")
    )


_DOT_SQL = """
  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
         SUM(CAST(qv.v AS DOUBLE) * CAST(cv.v AS DOUBLE)) AS dot,
         SUM(CAST(qv.v AS DOUBLE) * CAST(qv.v AS DOUBLE)) AS qq,
         SUM(CAST(cv.v AS DOUBLE) * CAST(cv.v AS DOUBLE)) AS cc
  FROM (SELECT vec_id, UNNEST(embedding) AS v,
               generate_subscripts(embedding, 1) AS i
        FROM embeddings WHERE vec_id {qfilt}) qv
  JOIN (SELECT vec_id, UNNEST(embedding) AS v,
               generate_subscripts(embedding, 1) AS i
        FROM embeddings WHERE vec_id {cfilt}) cv
    ON qv.i = cv.i {pairfilt}
  JOIN embeddings q ON q.vec_id = qv.vec_id
  JOIN embeddings c ON c.vec_id = cv.vec_id
  GROUP BY 1, 2
"""

COSINE_TOPK_SQL = f"""
WITH pairs AS (
  SELECT qv.vec_id AS query_id, cv.vec_id AS cand_id,
         SUM(CAST(qv.v AS DOUBLE) * CAST(cv.v AS DOUBLE)) AS dot
  FROM (SELECT vec_id, UNNEST(embedding) AS v,
               generate_subscripts(embedding, 1) AS i
        FROM embeddings WHERE vec_id < {TOPK_N_QUERIES}) qv
  JOIN (SELECT vec_id, UNNEST(embedding) AS v,
               generate_subscripts(embedding, 1) AS i
        FROM embeddings WHERE vec_id >= {TOPK_N_QUERIES}) cv
    ON qv.i = cv.i
  GROUP BY 1, 2
), norms AS (
  SELECT vec_id, SUM(CAST(v AS DOUBLE) * CAST(v AS DOUBLE)) AS nrm
  FROM (SELECT vec_id, UNNEST(embedding) AS v FROM embeddings)
  GROUP BY 1
), scored AS (
  SELECT query_id, cand_id,
         (ROUND(dot / SQRT(nq.nrm * nc.nrm) * 1e6) / 1e6) AS cosine
  FROM pairs
  JOIN norms nq ON nq.vec_id = query_id
  JOIN norms nc ON nc.vec_id = cand_id
)
SELECT query_id, rnk, cand_id, cosine FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, cand_id ASC) AS rnk
  FROM scored
) WHERE rnk <= {TOPK_K}
"""


def embedding_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup detection (north-star dedup): all pairs
    above a cosine threshold within a bounded id range (exact oracle for
    the LSH near-dup path)."""
    e = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < NEARDUP_CAP)
        .select(
            "vec_id",
            "embedding",
            _dot(F.col("embedding"), F.col("embedding")).alias("nrm"),
        )
    )
    a = e.select(
        F.col("vec_id").alias("id_a"), F.col("embedding").alias("emb_a"),
        F.col("nrm").alias("nrm_a"),
    )
    b = e.select(
        F.col("vec_id").alias("id_b"), F.col("embedding").alias("emb_b"),
        F.col("nrm").alias("nrm_b"),
    )
    pairs = a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
    return pairs.select(
        "id_a",
        "id_b",
        stable_round(
            _dot(F.col("emb_a"), F.col("emb_b")) / F.sqrt(F.col("nrm_a") * F.col("nrm_b")),
            6,
        ).alias("cosine"),
    ).filter(F.col("cosine") >= NEARDUP_MIN_COS)


NEARDUP_SQL = f"""
WITH sub AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < {NEARDUP_CAP}),
pairs AS (
  SELECT av.vec_id AS id_a, bv.vec_id AS id_b,
         SUM(CAST(av.v AS DOUBLE) * CAST(bv.v AS DOUBLE)) AS dot
  FROM (SELECT vec_id, UNNEST(embedding) AS v,
               generate_subscripts(embedding, 1) AS i FROM sub) av
  JOIN (SELECT vec_id, UNNEST(embedding) AS v,
               generate_subscripts(embedding, 1) AS i FROM sub) bv
    ON av.i = bv.i AND av.vec_id < bv.vec_id
  GROUP BY 1, 2
), norms AS (
  SELECT vec_id, SUM(CAST(v AS DOUBLE) * CAST(v AS DOUBLE)) AS nrm
  FROM (SELECT vec_id, UNNEST(embedding) AS v FROM sub)
  GROUP BY 1
)
SELECT id_a, id_b, (ROUND(dot / SQRT(na.nrm * nb.nrm) * 1e6) / 1e6) AS cosine
FROM pairs JOIN norms na ON na.vec_id = id_a JOIN norms nb ON nb.vec_id = id_b
WHERE (ROUND(dot / SQRT(na.nrm * nb.nrm) * 1e6) / 1e6) >= {NEARDUP_MIN_COS}
"""


def nearest_centroid_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NearestCentroid (SURVEY §2.8 M5 — no MLlib equivalent, custom
    DataFrame composition): per-label centroids via posexplode + avg,
    re-assembled to arrays, broadcast, then argmin squared-L2 assignment
    for vec_id < {cap}. The reference fits sklearn NearestCentroid at
    modeling/modeling.ipynb:537 (cell 31)."""
    e = load_table(spark, sf_dir, "embeddings")
    pos = e.select("vec_id", "label", F.posexplode("embedding").alias("pos", "v"))
    cent = (
        pos.groupBy("label", "pos")
        .agg(
            stable_round(
                F.sum(F.col("v").cast("double")) / F.count(F.lit(1)), 6
            ).alias("cv")
        )
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "cv"))), lambda s: s["cv"]
            ).alias("centroid")
        )
        .select(F.col("label").alias("c_label"), "centroid")
    )
    sub = e.filter(F.col("vec_id") < CENTROID_ASSIGN_CAP)
    dist = stable_round(
        F.aggregate(
            F.zip_with(
                F.col("embedding"),
                F.col("centroid"),
                lambda x, c: (x.cast("double") - c) * (x.cast("double") - c),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        6,
    )
    scored = sub.join(F.broadcast(cent)).select(
        "vec_id", "label", "c_label", dist.alias("dist")
    )
    w = W.partitionBy("vec_id").orderBy(F.col("dist").asc(), F.col("c_label").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "vec_id",
            F.col("label").alias("true_label"),
            F.col("c_label").alias("assigned_label"),
            F.col("dist").alias("sq_dist"),
        )
    )


CENTROID_SQL = f"""
WITH flat AS (
  SELECT vec_id, label, UNNEST(embedding) AS v,
         generate_subscripts(embedding, 1) AS i
  FROM embeddings
), cent AS (
  SELECT label AS c_label, i,
         (ROUND(SUM(CAST(v AS DOUBLE)) / COUNT(*) * 1e6) / 1e6) AS cv
  FROM flat GROUP BY 1, 2
), sub AS (
  SELECT * FROM flat WHERE vec_id < {CENTROID_ASSIGN_CAP}
), dists AS (
  SELECT sub.vec_id, sub.label AS true_label, cent.c_label,
         (ROUND(SUM((CAST(sub.v AS DOUBLE) - cent.cv) * (CAST(sub.v AS DOUBLE) - cent.cv)) * 1e6) / 1e6) AS sq_dist
  FROM sub JOIN cent ON sub.i = cent.i
  GROUP BY 1, 2, 3
)
SELECT vec_id, true_label, assigned_label, sq_dist FROM (
  SELECT vec_id, true_label, c_label AS assigned_label, sq_dist,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sq_dist ASC, c_label ASC) AS rn
  FROM dists
) WHERE rn = 1
"""


QUERIES: dict[str, QueryDef] = {
    "cosine_topk_bruteforce": QueryDef(
        cosine_topk_bruteforce, COSINE_TOPK_SQL, "similarity: brute-force top-k"
    ),
    "embedding_neardup_pairs": QueryDef(
        embedding_neardup_pairs, NEARDUP_SQL, "dedup: embedding cosine"
    ),
    "nearest_centroid_assign": QueryDef(
        nearest_centroid_assign, CENTROID_SQL, "M5 NearestCentroid assignment"
    ),
}
