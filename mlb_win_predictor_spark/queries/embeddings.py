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
from ..operators.similarity import cosine_matmul_scorer
from ..session import fan_out, load_table
from .base import QueryDef
from .text import BM25_SQL, bm25_score

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


def cosine_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k ANN baseline: for each query vector
    (vec_id < {nq}), the {k} nearest candidates by cosine. The query
    matrix (8×64 — a bounded collect; a broadcast variable at real query
    counts) ships inside an Arrow-batched ``mapInPandas`` closure and
    every candidate batch is ONE numpy matmul against it — dense linear
    algebra is the one hot path where vectorized C beats the JVM: the
    zip_with/aggregate HOF fold this replaced (r9) is interpreted
    per-element and measured 3× slower at sf1 (2.2s vs 0.74s,
    bit-identical rows; the element_at "codegen" unroll was 3-4× slower
    still — both negative results pinned here). Candidates stream
    map-only; the only shuffle is the final per-query top-k window.
    Float grain: float64 products, half-away 6dp rounding — the same
    ops stable_round performs, so the DuckDB oracle is unchanged."""
    e = load_table(spark, sf_dir, "embeddings")
    qrows = sorted(
        e.filter(F.col("vec_id") < TOPK_N_QUERIES)
        .select("vec_id", "embedding")
        .collect(),
        key=lambda r: r.vec_id,
    )
    score = cosine_matmul_scorer(
        [r.vec_id for r in qrows],
        [r.embedding for r in qrows],
        id_in="vec_id",
        vec_in="embedding",
        score_col="cosine",
        rounded=True,
    )
    c = e.filter(F.col("vec_id") >= TOPK_N_QUERIES).select("vec_id", "embedding")
    scored = c.mapInPandas(score, "query_id long, cand_id long, cosine double")
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("cand_id").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOPK_K)
        .select("query_id", F.col("rnk").cast("long").alias("rnk"), "cand_id", "cosine")
    )




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


def similarity_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-FILTERED vector search (the production shape of ANN:
    "nearest neighbors WHERE <predicate>" — per-tenant search, class-
    constrained retrieval, freshness windows): each query's top-{k} by
    cosine among candidates sharing the query's ``label``.

    The predicate is applied as a JOIN KEY, not a post-filter: Catalyst
    turns the label equality into the join's hash key, so only same-label
    pairs are ever scored — pre-filtering, which keeps exactly k results
    per query regardless of selectivity. (Post-filtering a global top-k
    pool returns <k rows whenever the pool under-covers the predicate —
    the classic filtered-ANN recall bug.) At 100 TB the same shape holds:
    the label partitions the candidate scan and the broadcast query side
    only meets its own partition's rows."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < TOPK_N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("q_label"),
        F.col("embedding").alias("q_emb"),
        _dot(F.col("embedding"), F.col("embedding")).alias("q_nrm"),
    )
    c = e.filter(F.col("vec_id") >= TOPK_N_QUERIES).select(
        F.col("vec_id").alias("cand_id"),
        F.col("label").alias("c_label"),
        F.col("embedding").alias("c_emb"),
        _dot(F.col("embedding"), F.col("embedding")).alias("c_nrm"),
    )
    scored = c.join(F.broadcast(q), F.col("c_label") == F.col("q_label")).select(
        "query_id",
        F.col("q_label").alias("label"),
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
        .select(
            "query_id",
            "label",
            F.col("rnk").cast("long").alias("rnk"),
            "cand_id",
            "cosine",
        )
    )


FILTERED_TOPK_SQL = f"""
WITH q AS (
  SELECT vec_id, label, embedding FROM embeddings WHERE vec_id < {TOPK_N_QUERIES}
), c AS (
  SELECT vec_id, label, embedding FROM embeddings WHERE vec_id >= {TOPK_N_QUERIES}
), pairs AS (
  SELECT qv.vec_id AS query_id, cv.vec_id AS cand_id,
         SUM(CAST(qv.v AS DOUBLE) * CAST(cv.v AS DOUBLE)) AS dot
  FROM (SELECT vec_id, label, UNNEST(embedding) AS v,
               generate_subscripts(embedding, 1) AS i FROM q) qv
  JOIN (SELECT vec_id, label, UNNEST(embedding) AS v,
               generate_subscripts(embedding, 1) AS i FROM c) cv
    ON qv.i = cv.i AND qv.label = cv.label
  GROUP BY 1, 2
), norms AS (
  SELECT vec_id, SUM(CAST(v AS DOUBLE) * CAST(v AS DOUBLE)) AS nrm
  FROM (SELECT vec_id, UNNEST(embedding) AS v FROM embeddings)
  GROUP BY 1
), scored AS (
  SELECT query_id, q.label AS label, cand_id,
         (ROUND(dot / SQRT(nq.nrm * nc.nrm) * 1e6) / 1e6) AS cosine
  FROM pairs
  JOIN embeddings q ON q.vec_id = query_id
  JOIN norms nq ON nq.vec_id = query_id
  JOIN norms nc ON nc.vec_id = cand_id
)
SELECT query_id, label, rnk, cand_id, cosine FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, cand_id ASC) AS rnk
  FROM scored
) WHERE rnk <= {TOPK_K}
"""


MMR_POOL = 12
MMR_K = 5
MMR_LAMBDA = 0.7


def mmr_diversified_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-Marginal-Relevance diversified re-rank (Carbonell &
    Goldstein 1998; the standard RAG retrieval step that stops the top-k
    being {MMR_K} near-copies of the same passage): per query, pool the
    {MMR_POOL} highest-cosine candidates, then greedily select {MMR_K}
    maximizing ``λ·cos(q,c) − (1−λ)·max_{{s∈S}} cos(c,s)``.

    Scale shape: the corpus-sized work is the pooling (same plan as
    ``cosine_topk_bruteforce`` — at 100 TB, an ANN index pass); the
    iterative MMR loop runs per-query over a POOL-BOUNDED Arrow batch in
    ``applyInPandas`` ({MMR_POOL} vectors — numpy does k·pool cosine
    ops per group, never the corpus). Deterministic: 6dp-rounded scores,
    ties broken by cand_id, so retry-stable. Greedy selection is
    sequential, but K is a compile-time constant — so the r9 DuckDB
    oracle (``MMR_SQL``) unrolls the loop into K chained argmax CTEs
    and the entry is fully value-hashed; numpy parity is additionally
    pinned in tests/test_operators.py."""
    import numpy as np
    import pandas as pd

    e = load_table(spark, sf_dir, "embeddings")
    # pooling pass = the same Arrow-batched numpy matmul as
    # cosine_topk_bruteforce (r9 — the HOF fold it replaced measured 3×
    # slower; values bit-identical at the shared 6dp half-away grain).
    # The pool's vectors are re-fetched AFTERWARD via a broadcast-pruned
    # second scan: ≤ {nq}×{pool} ids, so the join is a map-only
    # BroadcastHashJoin over one parquet column — cheaper than shipping
    # every candidate's vector back out of the scoring UDF.
    qrows = sorted(
        e.filter(F.col("vec_id") < TOPK_N_QUERIES)
        .select("vec_id", "embedding")
        .collect(),
        key=lambda r: r.vec_id,
    )
    score = cosine_matmul_scorer(
        [r.vec_id for r in qrows],
        [r.embedding for r in qrows],
        id_in="vec_id",
        vec_in="embedding",
        score_col="cosine",
        rounded=True,
    )
    scored = (
        e.filter(F.col("vec_id") >= TOPK_N_QUERIES)
        .select("vec_id", "embedding")
        .mapInPandas(score, "query_id long, cand_id long, cosine double")
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("cand_id").asc())
    ranked = scored.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= MMR_POOL
    )
    vecs = e.select(F.col("vec_id").alias("cand_id"), F.col("embedding").alias("c_emb"))
    pool = vecs.join(F.broadcast(ranked), "cand_id")

    def mmr(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["cosine", "cand_id"], ascending=[False, True])
        vecs = np.stack(pdf["c_emb"].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(vecs, axis=1)
        rel = pdf["cosine"].to_numpy()
        ids = pdf["cand_id"].to_numpy()
        n = len(ids)
        sim = (vecs @ vecs.T) / np.outer(norms, norms)
        # half-away-from-zero at 6dp — the exact op ROUND(x*1e6)/1e6
        # performs in Spark AND DuckDB (stable_round / sround), so the
        # r9 SQL oracle replays the same penalty grid; np.round would
        # round half-to-even and diverge on exact .5 boundaries
        sim = np.copysign(np.floor(np.abs(sim) * 1e6 + 0.5), sim) / 1e6
        chosen: list[int] = []
        free = list(range(n))
        while free and len(chosen) < MMR_K:
            if chosen:
                penalty = sim[np.ix_(free, chosen)].max(axis=1)
            else:
                penalty = np.zeros(len(free))
            mmr_score = MMR_LAMBDA * rel[free] - (1.0 - MMR_LAMBDA) * penalty
            # argmax with cand_id tie-break: free is cand_id-ordered within
            # equal cosine, so first max index is deterministic
            best = int(np.lexsort((ids[free], -mmr_score))[0])
            chosen.append(free.pop(best))
        return pd.DataFrame(
            {
                "query_id": pdf["query_id"].iloc[0],
                "mmr_rank": np.arange(1, len(chosen) + 1, dtype=np.int64),
                "cand_id": ids[chosen],
                "cosine": rel[chosen],
            }
        )

    return pool.groupBy("query_id").applyInPandas(
        mmr, "query_id long, mmr_rank long, cand_id long, cosine double"
    )


def _mmr_oracle_sql() -> str:
    """Unrolled {MMR_K}-step greedy MMR as one DuckDB query (r9 oracle
    promotion). Greedy selection is sequential, but K is a compile-time
    constant — so each step is a chained CTE: anti-join the pool against
    the chosen-so-far set, penalty = MAX pairwise sim to chosen, argmax
    by ``λ·rel − (1−λ)·penalty`` with cand_id tie-break. Float grain
    matches the Spark entry op-for-op: rel and sim are 6dp
    half-away-rounded (the stable_round idiom), the λ blend uses the
    engine-evaluated ``(1.0 − λ)`` double, and pair norms multiply as
    ``SQRT(na)*SQRT(nb)`` exactly as numpy's ``outer(norms, norms)``."""
    lam = MMR_LAMBDA
    head = f"""
WITH ex AS (
  SELECT vec_id, CAST(UNNEST(embedding) AS DOUBLE) AS v,
         generate_subscripts(embedding, 1) AS i
  FROM embeddings
),
norms AS (
  SELECT vec_id, SUM(v * v) AS nrm FROM ex GROUP BY 1
),
dots AS (
  SELECT q.vec_id AS query_id, c.vec_id AS cand_id, SUM(q.v * c.v) AS dot
  FROM ex q JOIN ex c ON q.i = c.i
  WHERE q.vec_id < {TOPK_N_QUERIES} AND c.vec_id >= {TOPK_N_QUERIES}
  GROUP BY 1, 2
),
pool AS (
  SELECT query_id, cand_id, cosine FROM (
    SELECT d.query_id, d.cand_id,
           (ROUND(d.dot / SQRT(nq.nrm * nc.nrm) * 1e6) / 1e6) AS cosine,
           ROW_NUMBER() OVER (
             PARTITION BY d.query_id
             ORDER BY (ROUND(d.dot / SQRT(nq.nrm * nc.nrm) * 1e6) / 1e6) DESC,
                      d.cand_id ASC) AS rnk
    FROM dots d
    JOIN norms nq ON nq.vec_id = d.query_id
    JOIN norms nc ON nc.vec_id = d.cand_id
  ) WHERE rnk <= {MMR_POOL}
),
psim AS (
  SELECT a.query_id, a.cand_id AS id_a, b.cand_id AS id_b,
         (ROUND(SUM(ea.v * eb.v)
                / (SQRT(na.nrm) * SQRT(nb.nrm)) * 1e6) / 1e6) AS sim
  FROM pool a
  JOIN pool b ON b.query_id = a.query_id
  JOIN ex ea ON ea.vec_id = a.cand_id
  JOIN ex eb ON eb.vec_id = b.cand_id AND eb.i = ea.i
  JOIN norms na ON na.vec_id = a.cand_id
  JOIN norms nb ON nb.vec_id = b.cand_id
  GROUP BY a.query_id, a.cand_id, b.cand_id, na.nrm, nb.nrm
),
sel1 AS (
  SELECT query_id, cand_id, cosine, CAST(1 AS BIGINT) AS mmr_rank FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY cosine DESC, cand_id ASC) AS rn
    FROM pool
  ) WHERE rn = 1
),
chosen1 AS (SELECT * FROM sel1)"""
    steps = []
    for k in range(2, MMR_K + 1):
        steps.append(f""",
sel{k} AS (
  SELECT query_id, cand_id, cosine, CAST({k} AS BIGINT) AS mmr_rank FROM (
    SELECT p.query_id, p.cand_id, p.cosine,
           ROW_NUMBER() OVER (
             PARTITION BY p.query_id
             ORDER BY ({lam} * p.cosine - (1.0 - {lam}) * pen.mx) DESC,
                      p.cand_id ASC) AS rn
    FROM pool p
    JOIN (SELECT ps.query_id, ps.id_a AS cand_id, MAX(ps.sim) AS mx
          FROM psim ps
          JOIN chosen{k - 1} ch
            ON ch.query_id = ps.query_id AND ch.cand_id = ps.id_b
          GROUP BY 1, 2) pen
      ON pen.query_id = p.query_id AND pen.cand_id = p.cand_id
    LEFT JOIN chosen{k - 1} dup
      ON dup.query_id = p.query_id AND dup.cand_id = p.cand_id
    WHERE dup.cand_id IS NULL
  ) WHERE rn = 1
),
chosen{k} AS (SELECT * FROM chosen{k - 1} UNION ALL SELECT * FROM sel{k})""")
    tail = f"""
SELECT query_id, mmr_rank, cand_id, cosine FROM chosen{MMR_K}
"""
    return head + "".join(steps) + tail


MMR_SQL = _mmr_oracle_sql()


MRL_DIMS = (8, 16, 32, 64)


def similarity_truncated_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka/truncated-embedding EVALUATION (the measurement behind
    "can we search on the first d dims and pay 1/8th the index?" — MRL,
    Kusupati et al. 2022): recall@{k} of cosine top-{k} under prefix
    truncation to d ∈ {dims} dimensions, against the full-width exact
    ranking.

    ONE pair pass computes every width, and the pair-grain work is only
    what is genuinely pair-grain: the element products are computed ONCE
    per pair (one ``zip_with``, staged in its own projection per the
    HOF-staging rule) and each width's dot is a re-SUM of a prefix slice
    of that product array — no per-width re-multiplication; the per-width
    SELF-norms belong to the row grain and are precomputed per query /
    per candidate row BEFORE the join (moving them out of the |q|×|c|
    loop — r7: the pair pass previously recomputed 3 slice-dots per
    width per pair, the worst honest ratio in the sf1 sweep at 6.56×).
    Values are bit-identical: same products, same fold order. Ranks per
    (d, query) ride one window; recall joins each width's top-k against
    the full-width top-k from the SAME scored table. Deterministic (6dp
    + id tie-breaks) ⇒ full DuckDB oracle since r9
    (``TRUNCATED_RECALL_SQL`` replays slice→rank→recall); invariants
    additionally pinned in tests (full-width recall ≡ 1, bounds,
    per-width row counts)."""
    e = load_table(spark, sf_dir, "embeddings")
    full_d = MRL_DIMS[-1]

    def prefix_sq_norms(col: str):
        return F.array(
            *[_dot(F.slice(col, 1, d), F.slice(col, 1, d)) for d in MRL_DIMS]
        )

    q = e.filter(F.col("vec_id") < TOPK_N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        prefix_sq_norms("embedding").alias("q_nrm"),
    )
    # fan_out: the pair pass (64 mults + per-width folds per candidate ×
    # query) dwarfs the candidate row's bytes, and the testdata parquet
    # reads as 1-2 row groups — without this the whole scoring pipeline
    # pins to 2 tasks (no-op once the scan has >= cores splits).
    c = fan_out(e.filter(F.col("vec_id") >= TOPK_N_QUERIES)).select(
        F.col("vec_id").alias("cand_id"),
        F.col("embedding").alias("c_emb"),
        prefix_sq_norms("embedding").alias("c_nrm"),
    )
    per_dim = F.array(
        *[
            F.struct(
                F.lit(d).cast("long").alias("dims"),
                stable_round(
                    F.aggregate(
                        F.slice(F.col("_prods"), 1, d),
                        F.lit(0.0),
                        lambda acc, x: acc + x,
                    )
                    / F.sqrt(
                        F.element_at("q_nrm", i + 1) * F.element_at("c_nrm", i + 1)
                    ),
                    6,
                ).alias("cosine"),
            )
            for i, d in enumerate(MRL_DIMS)
        ]
    )
    scored = (
        c.join(F.broadcast(q))
        # staged projection: the product array is consumed inside the
        # per-width aggregate lambdas — materialize it once per pair
        .select(
            "query_id",
            "cand_id",
            "q_nrm",
            "c_nrm",
            F.zip_with(
                "q_emb", "c_emb", lambda a, b: a.cast("double") * b.cast("double")
            ).alias("_prods"),
        )
        .select("query_id", "cand_id", F.explode(per_dim).alias("s"))
        .select("query_id", "cand_id", F.col("s.dims").alias("dims"), F.col("s.cosine").alias("cosine"))
    )
    w = W.partitionBy("dims", "query_id").orderBy(
        F.col("cosine").desc(), F.col("cand_id").asc()
    )
    topk = (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOPK_K)
        .select("dims", "query_id", "cand_id")
    )
    truth = topk.filter(F.col("dims") == full_d).select(
        F.col("query_id").alias("t_q"), F.col("cand_id").alias("t_c")
    )
    hits = topk.join(
        truth,
        (F.col("query_id") == F.col("t_q")) & (F.col("cand_id") == F.col("t_c")),
        "left",
    )
    denom = float(TOPK_N_QUERIES * TOPK_K)
    return (
        hits.groupBy("dims")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_retrieved"),
            stable_round(
                F.sum(F.col("t_q").isNotNull().cast("int")) / F.lit(denom), 6
            ).alias("recall_at_k"),
        )
        .orderBy("dims")
    )


# Full-parity oracle (promoted r9 from rows-only): the eval is fully
# deterministic — per-width cosines are 6dp-stable-rounded BEFORE the
# rank (fold-order fuzz ~1e-12 is swallowed, the COSINE_TOPK precedent)
# and ties break on cand_id — so DuckDB can replay the whole
# slice→rank→recall pipeline. Prefix dots/norms come from one unnested
# (vec, i) table filtered to i <= width; the width set rides a VALUES
# cross join.
TRUNCATED_RECALL_SQL = f"""
WITH widths AS (SELECT UNNEST({list(MRL_DIMS)}) AS dims),
ex AS (
  SELECT vec_id, CAST(UNNEST(embedding) AS DOUBLE) AS v,
         generate_subscripts(embedding, 1) AS i
  FROM embeddings
),
norms AS (
  SELECT w.dims, e.vec_id, SUM(e.v * e.v) AS nrm
  FROM widths w JOIN ex e ON e.i <= w.dims
  GROUP BY 1, 2
),
dots AS (
  SELECT w.dims, q.vec_id AS query_id, c.vec_id AS cand_id,
         SUM(q.v * c.v) AS dot
  FROM widths w
  JOIN ex q ON q.i <= w.dims AND q.vec_id < {TOPK_N_QUERIES}
  JOIN ex c ON c.i = q.i AND c.vec_id >= {TOPK_N_QUERIES}
  GROUP BY 1, 2, 3
),
topk AS (
  SELECT dims, query_id, cand_id FROM (
    SELECT d.dims, d.query_id, d.cand_id,
           ROW_NUMBER() OVER (
             PARTITION BY d.dims, d.query_id
             ORDER BY (ROUND(d.dot / SQRT(nq.nrm * nc.nrm) * 1e6) / 1e6) DESC,
                      d.cand_id ASC) AS rnk
    FROM dots d
    JOIN norms nq ON nq.dims = d.dims AND nq.vec_id = d.query_id
    JOIN norms nc ON nc.dims = d.dims AND nc.vec_id = d.cand_id
  ) WHERE rnk <= {TOPK_K}
),
truth AS (
  SELECT query_id AS t_q, cand_id AS t_c FROM topk WHERE dims = {MRL_DIMS[-1]}
)
SELECT CAST(t.dims AS BIGINT) AS dims,
       CAST(COUNT(*) AS BIGINT) AS n_retrieved,
       (ROUND(SUM(CASE WHEN tr.t_q IS NOT NULL THEN 1 ELSE 0 END)
              / CAST({TOPK_N_QUERIES * TOPK_K} AS DOUBLE) * 1e6) / 1e6)
         AS recall_at_k
FROM topk t
LEFT JOIN truth tr ON tr.t_q = t.query_id AND tr.t_c = t.cand_id
GROUP BY 1
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


def rounded_centroids(e: DataFrame) -> DataFrame:
    """Per-label element-wise centroid means over ``embeddings``,
    6dp-rounded at the CENTROID grain — the cross-engine quantum shared
    by the Spark plans and the DuckDB duals (``CENTROID_SQL``,
    ``ML_NEAREST_CENTROID_SQL``): with identical rounded centroids on
    both engines, only the (6dp-rounded) distance folds can differ, and
    those agree far below the quantum on this data. Returns
    ``(c_label, centroid array<double>)``; shuffle is one row per
    (label, dim) — k·d, independent of corpus size."""
    pos = e.select("vec_id", "label", F.posexplode("embedding").alias("pos", "v"))
    return (
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


def nearest_centroid_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NearestCentroid (SURVEY §2.8 M5 — no MLlib equivalent, custom
    DataFrame composition): per-label centroids via posexplode + avg,
    re-assembled to arrays, broadcast, then argmin squared-L2 assignment
    for vec_id < {cap}. The reference fits sklearn NearestCentroid at
    modeling/modeling.ipynb:537 (cell 31)."""
    e = load_table(spark, sf_dir, "embeddings")
    cent = rounded_centroids(e)
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


RRF_K = 60
RRF_POOL = 50
RRF_TOPK = 15


def hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval with reciprocal-rank fusion (Cormack et al. 2009):
    a lexical BM25 ranking (``text.bm25_score``, fixed query terms) and a
    dense cosine ranking (query = the doc-0 embedding; ``doc_id`` and
    ``vec_id`` are the same corpus key) each yield a top-{pool} pool, and
    rrf = 1/({k}+rank_lex) + 1/({k}+rank_dense) fuses them — the standard
    two-tower + keyword retrieval merge of a RAG/data-curation stack.

    Scale: both pools come from ``orderBy().limit()`` which Spark plans as
    TakeOrderedAndProject — a per-partition top-{pool} then a driver merge
    of {pool}-row heaps, NEVER a global sort. The rank windows and the
    full-outer fusion join then touch only 2x{pool} rows (single tiny
    partition, intentional). The corpus-sized work is exactly one BM25
    scan + one cosine scan, both map-only against broadcast stats."""
    lex_pool = (
        bm25_score(spark, sf_dir)
        .filter(F.col("doc_id") >= 1)
        .select("doc_id", "bm25")
        .orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
        .limit(RRF_POOL)
    )
    lex_rank = lex_pool.select(
        "doc_id",
        F.row_number()
        .over(W.orderBy(F.col("bm25").desc(), F.col("doc_id").asc()))
        .cast("long")
        .alias("rank_lex"),
    )
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q_emb"),
        _dot(F.col("embedding"), F.col("embedding")).alias("q_nrm"),
    )
    c = e.filter(F.col("vec_id") >= 1).select(
        F.col("vec_id").alias("doc_id"),
        F.col("embedding").alias("c_emb"),
        _dot(F.col("embedding"), F.col("embedding")).alias("c_nrm"),
    )
    dense_pool = (
        c.join(F.broadcast(q))
        .select(
            "doc_id",
            stable_round(
                _dot(F.col("q_emb"), F.col("c_emb"))
                / F.sqrt(F.col("q_nrm") * F.col("c_nrm")),
                6,
            ).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col("doc_id").asc())
        .limit(RRF_POOL)
    )
    dense_rank = dense_pool.select(
        "doc_id",
        F.row_number()
        .over(W.orderBy(F.col("cosine").desc(), F.col("doc_id").asc()))
        .cast("long")
        .alias("rank_dense"),
    )
    fused = lex_rank.join(dense_rank, "doc_id", "full_outer")
    rrf = stable_round(
        F.coalesce(F.lit(1.0) / (F.col("rank_lex") + RRF_K), F.lit(0.0))
        + F.coalesce(F.lit(1.0) / (F.col("rank_dense") + RRF_K), F.lit(0.0)),
        6,
    )
    return (
        fused.select("doc_id", "rank_lex", "rank_dense", rrf.alias("rrf"))
        .orderBy(F.col("rrf").desc(), F.col("doc_id").asc())
        .limit(RRF_TOPK)
    )


HYBRID_RRF_SQL = f"""
WITH lex_pool AS (
  SELECT doc_id, bm25 FROM ({{bm25}}) WHERE doc_id >= 1
  ORDER BY bm25 DESC, doc_id ASC LIMIT {RRF_POOL}
), lex_rank AS (
  SELECT doc_id, ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id ASC) AS rank_lex
  FROM lex_pool
), pairs AS (
  SELECT cv.vec_id AS doc_id, SUM(CAST(qv.v AS DOUBLE) * CAST(cv.v AS DOUBLE)) AS dot
  FROM (SELECT UNNEST(embedding) AS v, generate_subscripts(embedding, 1) AS i
        FROM embeddings WHERE vec_id = 0) qv
  JOIN (SELECT vec_id, UNNEST(embedding) AS v, generate_subscripts(embedding, 1) AS i
        FROM embeddings WHERE vec_id >= 1) cv ON qv.i = cv.i
  GROUP BY 1
), norms AS (
  SELECT vec_id, SUM(CAST(v AS DOUBLE) * CAST(v AS DOUBLE)) AS nrm
  FROM (SELECT vec_id, UNNEST(embedding) AS v FROM embeddings) GROUP BY 1
), dense_pool AS (
  SELECT doc_id, (ROUND(dot / SQRT(nq.nrm * nc.nrm) * 1e6) / 1e6) AS cosine
  FROM pairs
  JOIN norms nq ON nq.vec_id = 0
  JOIN norms nc ON nc.vec_id = doc_id
  ORDER BY cosine DESC, doc_id ASC LIMIT {RRF_POOL}
), dense_rank AS (
  SELECT doc_id, ROW_NUMBER() OVER (ORDER BY cosine DESC, doc_id ASC) AS rank_dense
  FROM dense_pool
)
SELECT COALESCE(l.doc_id, d.doc_id) AS doc_id,
       CAST(rank_lex AS BIGINT) AS rank_lex,
       CAST(rank_dense AS BIGINT) AS rank_dense,
       (ROUND((COALESCE(1.0 / (rank_lex + {RRF_K}), 0.0)
             + COALESCE(1.0 / (rank_dense + {RRF_K}), 0.0)) * 1e6) / 1e6) AS rrf
FROM lex_rank l FULL OUTER JOIN dense_rank d ON l.doc_id = d.doc_id
ORDER BY rrf DESC, doc_id ASC LIMIT {RRF_TOPK}
""".format(bm25=BM25_SQL)


SQ8_N_QUERIES = 4
SQ8_POOL = 32
SQ8_TOPK = 5


def similarity_sq8_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-quantized (int8) ANN with exact re-rank — the deterministic
    sibling of the PQ/ADC path (``similarity_ann_pq``): per-dimension
    corpus min/max (ONE 64-group aggregation, map-side combined) define a
    linear int8 code ``round((v-mn)/(mx-mn)*255)-128``; the coarse pass
    scores cosine over the DEQUANTIZED codes (4x fewer vector bytes at
    rest in a production layout); the top-{pool} per query is re-ranked
    with exact float cosine. Unlike the hash-seeded LSH variants this is
    a pure function of the data, so it gets the full DuckDB value-hash
    oracle, not a recall bound.

    Scale: the stats row broadcasts; the coarse scan is map-only against
    the broadcast queries; the per-query window moves (queries x
    candidates) score rows ONLY (no vectors through the shuffle); the
    exact re-rank joins the {nq}x{pool}-row pool back to the corpus —
    AQE broadcasts the pool, so the re-read touches one corpus scan with
    a pushed-down semi-join filter."""
    e = load_table(spark, sf_dir, "embeddings")
    # NOT persisted (r13, r12 verdict #6 — measured NEGATIVE): the 1-row
    # stats frame feeds BOTH branches of `base`, and the plan builds the
    # posexplode + 64-group aggregation twice behind two separate
    # BroadcastExchanges (r12 before-plan nodes 13/28). Pinning the
    # scalar with .persist() computes it once — and LOST the interleaved
    # same-JVM A/B at sf0.1 decisively: 2.03 s → 2.86 s med-of-fastest-3
    # (the cache-population barrier serializes what two idle-core
    # subtrees otherwise compute in parallel; same verdict as the r12
    # `base`-persist wash and the dsir kc / kl_divergence by_cell
    # persists). At 100 TB the duplication disappears by LAYOUT, not by
    # cache: the int8 codes and their min/max stats are a stored table,
    # written once and scanned per query.
    stats = (
        e.select(F.posexplode("embedding").alias("i", "v"))
        .groupBy("i")
        .agg(F.min("v").alias("mn"), F.max("v").alias("mx"))
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("i", "mn"))), lambda s: s["mn"]
            ).alias("mn_arr"),
            F.transform(
                F.array_sort(F.collect_list(F.struct("i", "mx"))), lambda s: s["mx"]
            ).alias("mx_arr"),
        )
    )
    rng = F.zip_with(
        F.col("mx_arr"), F.col("mn_arr"), lambda a, b: a.cast("double") - b.cast("double")
    )
    shifted = F.zip_with(
        F.col("embedding"),
        F.col("mn_arr"),
        lambda v, m: v.cast("double") - m.cast("double"),
    )
    code = F.zip_with(shifted, rng, lambda d, r: F.round(d / r * 255) - 128)
    deq = F.zip_with(
        F.zip_with(code, rng, lambda cd, r: (cd + 128) / 255.0 * r),
        F.col("mn_arr"),
        lambda t, m: m.cast("double") + t,
    )
    # NOTE: the query/candidate branches each recompute stats+dequant
    # (no CSE across DataFrame branches); persisting `base` was measured
    # a wash at bench scale (1.81s vs 1.77s). In production the codes
    # are a stored table — written once, scanned per query — so the
    # recompute disappears by layout, not by cache.
    base = e.crossJoin(F.broadcast(stats)).select("vec_id", deq.alias("deq"))
    qd = base.filter(F.col("vec_id") < SQ8_N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("deq").alias("q_deq"),
        _dot(F.col("deq"), F.col("deq")).alias("q_dnrm"),
    )
    cd = base.filter(F.col("vec_id") >= SQ8_N_QUERIES).select(
        F.col("vec_id").alias("cand_id"),
        F.col("deq").alias("c_deq"),
        _dot(F.col("deq"), F.col("deq")).alias("c_dnrm"),
    )
    coarse = cd.join(F.broadcast(qd)).select(
        "query_id",
        "cand_id",
        stable_round(
            _dot(F.col("q_deq"), F.col("c_deq"))
            / F.sqrt(F.col("q_dnrm") * F.col("c_dnrm")),
            6,
        ).alias("sq8_cosine"),
    )
    wp = W.partitionBy("query_id").orderBy(
        F.col("sq8_cosine").desc(), F.col("cand_id").asc()
    )
    pool = (
        coarse.withColumn("prn", F.row_number().over(wp))
        .filter(F.col("prn") <= SQ8_POOL)
        .select("query_id", "cand_id", "sq8_cosine")
    )
    qv = e.filter(F.col("vec_id") < SQ8_N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        _dot(F.col("embedding"), F.col("embedding")).alias("q_nrm"),
    )
    cv = e.filter(F.col("vec_id") >= SQ8_N_QUERIES).select(
        F.col("vec_id").alias("cand_id"),
        F.col("embedding").alias("c_emb"),
        _dot(F.col("embedding"), F.col("embedding")).alias("c_nrm"),
    )
    exact = (
        pool.join(F.broadcast(qv), "query_id")
        .join(cv, "cand_id")
        .select(
            "query_id",
            "cand_id",
            "sq8_cosine",
            stable_round(
                _dot(F.col("q_emb"), F.col("c_emb"))
                / F.sqrt(F.col("q_nrm") * F.col("c_nrm")),
                6,
            ).alias("cosine"),
        )
    )
    we = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("cand_id").asc())
    return (
        exact.withColumn("rnk", F.row_number().over(we).cast("long"))
        .filter(F.col("rnk") <= SQ8_TOPK)
        .select("query_id", "rnk", "cand_id", "sq8_cosine", "cosine")
    )


SQ8_SQL = f"""
WITH flat AS (
  SELECT vec_id, UNNEST(embedding) AS v, generate_subscripts(embedding, 1) AS i
  FROM embeddings
), st AS (
  SELECT i, MIN(v) AS mn, MAX(v) AS mx FROM flat GROUP BY 1
), deq AS (
  SELECT vec_id, f.i,
         CAST(mn AS DOUBLE)
         + (ROUND((CAST(v AS DOUBLE) - CAST(mn AS DOUBLE))
                  / (CAST(mx AS DOUBLE) - CAST(mn AS DOUBLE)) * 255) - 128 + 128)
           / 255.0 * (CAST(mx AS DOUBLE) - CAST(mn AS DOUBLE)) AS dv
  FROM flat f JOIN st USING (i)
), dnorms AS (
  SELECT vec_id, SUM(dv * dv) AS dnrm FROM deq GROUP BY 1
), cpairs AS (
  SELECT cd.vec_id AS cand_id, qd.vec_id AS query_id, SUM(qd.dv * cd.dv) AS dot
  FROM (SELECT * FROM deq WHERE vec_id < {SQ8_N_QUERIES}) qd
  JOIN (SELECT * FROM deq WHERE vec_id >= {SQ8_N_QUERIES}) cd ON qd.i = cd.i
  GROUP BY 1, 2
), coarse AS (
  SELECT query_id, cand_id,
         (ROUND(dot / SQRT(nq.dnrm * nc.dnrm) * 1e6) / 1e6) AS sq8_cosine
  FROM cpairs
  JOIN dnorms nq ON nq.vec_id = query_id
  JOIN dnorms nc ON nc.vec_id = cand_id
), pool AS (
  SELECT query_id, cand_id, sq8_cosine FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY sq8_cosine DESC, cand_id ASC) AS prn
    FROM coarse
  ) WHERE prn <= {SQ8_POOL}
), ex AS (
  SELECT p.query_id, p.cand_id, p.sq8_cosine,
         SUM(CAST(qf.v AS DOUBLE) * CAST(cf.v AS DOUBLE)) AS dot
  FROM pool p
  JOIN flat qf ON qf.vec_id = p.query_id
  JOIN flat cf ON cf.vec_id = p.cand_id AND qf.i = cf.i
  GROUP BY 1, 2, 3
), norms AS (
  SELECT vec_id, SUM(CAST(v AS DOUBLE) * CAST(v AS DOUBLE)) AS nrm
  FROM flat GROUP BY 1
)
SELECT query_id, CAST(rnk AS BIGINT) AS rnk, cand_id, sq8_cosine, cosine FROM (
  SELECT query_id, cand_id, sq8_cosine,
         (ROUND(dot / SQRT(nq.nrm * nc.nrm) * 1e6) / 1e6) AS cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY (ROUND(dot / SQRT(nq.nrm * nc.nrm) * 1e6) / 1e6) DESC,
                                     cand_id ASC) AS rnk
  FROM ex
  JOIN norms nq ON nq.vec_id = query_id
  JOIN norms nc ON nc.vec_id = cand_id
) WHERE rnk <= {SQ8_TOPK}
"""


QUERIES: dict[str, QueryDef] = {
    "cosine_topk_bruteforce": QueryDef(
        cosine_topk_bruteforce, COSINE_TOPK_SQL, "similarity: brute-force top-k"
    ),
    "similarity_filtered_topk": QueryDef(
        similarity_filtered_topk,
        FILTERED_TOPK_SQL,
        "similarity: metadata-filtered top-k (predicate as join key, pre-filter)",
    ),
    "mmr_diversified_topk": QueryDef(
        mmr_diversified_topk,
        MMR_SQL,
        "retrieval: MMR diversified re-rank over a pool-bounded Arrow batch",
    ),
    "similarity_truncated_recall": QueryDef(
        similarity_truncated_recall,
        TRUNCATED_RECALL_SQL,
        "similarity: Matryoshka prefix-truncation recall@k eval, one pair pass",
    ),
    "embedding_neardup_pairs": QueryDef(
        embedding_neardup_pairs, NEARDUP_SQL, "dedup: embedding cosine"
    ),
    "nearest_centroid_assign": QueryDef(
        nearest_centroid_assign, CENTROID_SQL, "M5 NearestCentroid assignment"
    ),
    "hybrid_search_rrf": QueryDef(
        hybrid_search_rrf,
        HYBRID_RRF_SQL,
        "retrieval: BM25 + dense cosine fused by reciprocal-rank fusion",
    ),
    "similarity_sq8_rerank": QueryDef(
        similarity_sq8_rerank,
        SQ8_SQL,
        "similarity: int8 scalar-quantized coarse pass + exact re-rank",
    ),
}
