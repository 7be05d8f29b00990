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


BUCKET_LENGTH_CEIL = 2.0  # legacy fixed value; auto-tune only shrinks it
BUCKET_OCCUPANCY_TARGET = 64  # expected train rows per LSH bucket


def _auto_bucket_length(
    train: DataFrame, features_col: str, id_col: str, seed: int
) -> float:
    """Occupancy-bounded LSH bucket width. The bucket join's volume is
    Σ_b |test_b|·|train_b| — with a FIXED width, per-bucket population
    grows linearly with corpus density and the join goes quadratic
    (measured in the round-6 full-catalog sweep: the kNN entries ran
    ~11 min at 10× data, 66× the base). Estimate the projection spread
    from a deterministic 1k-row sample (one seeded Gaussian direction —
    the same family BRP-LSH hashes with) and set
    ``w ≈ occupancy_target · spread / n``, capped at the legacy fixed
    width so small corpora keep their exact previous behavior (and the
    small-SF recall gates their exact previous numbers). As density
    grows, buckets narrow: candidates stay the TIGHTEST neighbors —
    precisely the LSH contract."""
    import numpy as np

    n = train.count()
    rows = (
        train.select(features_col, id_col)
        .orderBy(F.xxhash64(F.col(id_col)))
        .limit(1024)
        .collect()
    )
    if not rows:
        raise ValueError(
            "empty train split: LSH bucket sizing needs at least one row "
            f"with a non-null '{features_col}' vector"
        )
    X = np.array([list(r[0]) for r in rows], dtype=np.float64)
    g = np.random.default_rng(seed).standard_normal(X.shape[1])
    proj = X @ g
    spread = float(proj.max() - proj.min()) or 1.0
    return max(min(BUCKET_LENGTH_CEIL, BUCKET_OCCUPANCY_TARGET * spread / max(n, 1)), 1e-6)


def _bucket_exprs(features_col: str, dim: int, num_hash_tables: int,
                  bucket_length: float, seed: int):
    """One ``floor(v·g_t / w)`` column per hash table, with the seeded
    Gaussian directions inlined as PLAN LITERALS (the JL-projection
    trick, operators/similarity.py): retry-deterministic — any executor
    regenerates the identical plan — and fully whole-stage-codegen, no
    broadcast variable, no VectorUDT. The directions come from the SAME
    generator family ``_auto_bucket_length`` estimates spread with, so
    the occupancy math and the hash are in the same projection units."""
    import numpy as np

    G = np.random.default_rng(seed).standard_normal((num_hash_tables, dim))
    v = F.col(features_col)
    return [
        F.floor(
            F.aggregate(
                F.zip_with(
                    v,
                    F.array(*[F.lit(float(x)) for x in g]),
                    lambda a, b: a.cast("double") * b,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            / F.lit(float(bucket_length))
        ).cast("long")
        for g in G
    ]


def _ranked_neighbors(
    train: DataFrame,
    test: DataFrame,
    max_k: int,
    features_col: str,
    label_col: str,
    id_col: str,
    bucket_length: float | None,
    num_hash_tables: int,
    seed: int,
) -> DataFrame:
    """(test_id, n_label, n_id, _dist, rn<=max_k): each test row's max_k
    approximate nearest train rows, distance-ranked with a deterministic
    tie-break. One LSH bucket equi-join + one per-test-row window — the
    k-INDEPENDENT part of kNN, factored out so a k-grid sweep pays for
    the join once. ``bucket_length=None`` → occupancy-bounded auto
    width (see ``_auto_bucket_length``).

    NATIVE implementation (r7): buckets are literal column expressions
    (``_bucket_exprs``), candidates come from an equi-join on
    ``(table, bucket)`` with MULTI-PROBE on the query side (each query
    also probes the two adjacent buckets per table — Lv et al. 2007):
    narrow, occupancy-bounded buckets keep the candidate volume small
    while adjacent-probe recovers the neighbors a bucket boundary would
    split away (the recall of a 3×-wide bucket at ~⅓ the join volume,
    since the TRAIN side — the corpus — is indexed once per table, never
    widened). Distance is an exact euclidean ``zip_with`` fold; the
    whole plan stays inside whole-stage codegen. The MLlib path
    (``_ranked_neighbors_mllib``) computes the same contract through
    VectorUDT + struct explode and measured ~9s of overhead on an
    1800-row train side at sf0.1; it is retained as the cross-check
    oracle (tests/test_ml.py), the same discipline as the native banded
    MinHash vs MLlib MinHashLSH pair."""
    if bucket_length is None:
        bucket_length = _auto_bucket_length(train, features_col, id_col, seed)
    head = train.select(features_col).first()  # one-row driver peek
    if head is None or head[0] is None:
        raise ValueError(
            "empty train split: kNN ranking needs at least one train row "
            f"with a non-null '{features_col}' vector"
        )
    dim = len(head[0])

    def hashed(df: DataFrame, cols: list, feat: str, probes: int) -> DataFrame:
        buckets = _bucket_exprs(feat, dim, num_hash_tables, bucket_length, seed)
        exploded = df.select(
            *cols, F.posexplode(F.array(*buckets)).alias("_t", "_b0")
        )
        if probes == 1:
            return exploded.withColumnRenamed("_b0", "_bucket")
        offsets = F.array(*[F.lit(o) for o in range(-(probes // 2), probes // 2 + 1)])
        return exploded.select(
            *cols, "_t", F.explode(offsets).alias("_o"), F.col("_b0")
        ).select(*cols, "_t", (F.col("_b0") + F.col("_o")).alias("_bucket"))

    te = hashed(
        test.select(
            F.col(id_col).alias("test_id"), F.col(features_col).alias("_q_f")
        ),
        ["test_id", "_q_f"],
        "_q_f",
        probes=3,
    )
    tr = hashed(
        train.select(
            F.col(id_col).alias("n_id"),
            F.col(label_col).alias("n_label"),
            F.col(features_col).alias("_n_f"),
        ),
        ["n_id", "n_label", "_n_f"],
        "_n_f",
        probes=1,
    )
    pairs = (
        te.join(tr, ["_t", "_bucket"])
        .dropDuplicates(["test_id", "n_id"])  # collide in ≥1 table ⇒ once
        .select(
            "test_id",
            "n_label",
            "n_id",
            F.sqrt(
                F.aggregate(
                    F.zip_with(
                        F.col("_q_f"),
                        F.col("_n_f"),
                        lambda a, b: (a.cast("double") - b.cast("double"))
                        * (a.cast("double") - b.cast("double")),
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
            ).alias("_dist"),
        )
    )
    wk = W.partitionBy("test_id").orderBy(F.col("_dist").asc(), F.col("n_id").asc())
    return pairs.withColumn("rn", F.row_number().over(wk)).filter(F.col("rn") <= max_k)


def _ranked_neighbors_mllib(
    train: DataFrame,
    test: DataFrame,
    max_k: int,
    features_col: str,
    label_col: str,
    id_col: str,
    bucket_length: float | None,
    num_hash_tables: int,
    seed: int,
) -> DataFrame:
    """MLlib ``BucketedRandomProjectionLSH`` twin of ``_ranked_neighbors``
    — the cross-check oracle (different hash directions, same contract:
    distance-ranked approximate neighbors). Not on the entry path: the
    VectorUDT conversion + struct-explode join measured ~9s of overhead
    on an 1800-row train side where the native plan needs ~1s."""
    if bucket_length is None:
        bucket_length = _auto_bucket_length(train, features_col, id_col, seed)
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
    # bucket-join candidates within a generous radius, keep max_k per test row
    joined = model.approxSimilarityJoin(te, tr, float("inf"), distCol="_dist")
    pairs = joined.select(
        F.col(f"datasetA.{id_col}").alias("test_id"),
        F.col(f"datasetB.{label_col}").alias("n_label"),
        F.col(f"datasetB.{id_col}").alias("n_id"),
        F.col("_dist"),
    )
    wk = W.partitionBy("test_id").orderBy(F.col("_dist").asc(), F.col("n_id").asc())
    return pairs.withColumn("rn", F.row_number().over(wk)).filter(F.col("rn") <= max_k)


def _vote(topk: DataFrame) -> DataFrame:
    """(test_id, prediction): majority label with (votes desc, closest
    neighbor asc, label asc) deterministic tie-break."""
    votes = topk.groupBy("test_id", "n_label").agg(
        F.count(F.lit(1)).alias("votes"), F.min("_dist").alias("min_dist")
    )
    wv = W.partitionBy("test_id").orderBy(
        F.col("votes").desc(), F.col("min_dist").asc(), F.col("n_label").asc()
    )
    return (
        votes.withColumn("rn", F.row_number().over(wv))
        .filter(F.col("rn") == 1)
        .select("test_id", F.col("n_label").alias("prediction"))
    )


def knn_predict_lsh(
    train: DataFrame,
    test: DataFrame,
    k: int = 5,
    features_col: str = "features_arr",
    label_col: str = "label",
    id_col: str = "vec_id",
    bucket_length: float | None = None,
    num_hash_tables: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Returns test rows + ``prediction`` (majority label of ~k approximate
    nearest train neighbors). Deterministic given the seed."""
    topk = _ranked_neighbors(
        train, test, k, features_col, label_col, id_col,
        bucket_length, num_hash_tables, seed,
    )
    pred = _vote(topk)
    return test.join(pred, test[id_col] == pred.test_id, "left").drop("test_id")


def knn_select_k(
    train: DataFrame,
    val: DataFrame,
    k_grid: list[int],
    features_col: str = "features_arr",
    label_col: str = "label",
    id_col: str = "vec_id",
    bucket_length: float | None = None,
    num_hash_tables: int = 3,
    seed: int = 42,
) -> tuple[int, list[tuple[int, float]]]:
    """k-grid model selection for the LSH kNN (the reference sweeps
    KNeighborsClassifier over ``n_neighbors in {1,...,79}`` with
    GridSearchCV, modeling/modeling.ipynb:626): score each k on a held-out
    validation split, return (best_k, [(k, accuracy), ...]) with the
    ``grid_search_cv`` argmax policy (ties -> smallest k).

    The LSH join and distance ranking are k-INDEPENDENT, so the sweep
    ranks neighbors ONCE at max(k_grid), checkpoints that (|val| x max_k
    rows — bounded by the validation split, not the corpus), and derives
    EVERY k's vote in ONE plan: a broadcast join of the ranking against
    the k-grid (rn <= k) fans each neighbor row out to the grid points it
    participates in, one (k, test_id) vote aggregation ranks the labels,
    and one (k)-grain aggregation scores the grid — a single Spark action
    for the whole leaderboard. (r7: the previous shape derived each k's
    vote with its own action; correct and bounded, but ~|grid|+1 job
    waves of pure scheduler latency — 10 grid points cost 8.7s at sf0.1
    where the data itself needed ~4s. Fan-out volume is |val| x max_k x
    |grid| rows upper-bounded, all validation-grain.) Driver-side data:
    one float per k."""
    if not k_grid:
        raise ValueError("empty k_grid")
    # localCheckpoint, not cache(): a cache is only a HINT — under
    # memory pressure Spark silently evicts it and a re-read re-runs the
    # corpus-sized LSH bucket join (the round-6 full-catalog sweep
    # measured the grid at 66x for 10x data while the single-k vote
    # entry, same join, scaled 2.9x). A checkpoint is materialized data:
    # the join provably runs once, and the leaderboard plan below reads
    # the bounded val x max_k ranking, never the corpus. LAZY (r13, same
    # move as the indexing operators): the leaderboard collect is the
    # ONLY action over `ranked` and aggregates every partition, so it
    # materializes the blocks itself — one job instead of a dedicated
    # materialization job plus a block re-read.
    grid = sorted(set(k_grid))
    ranked = _ranked_neighbors(
        train, val, max(grid), features_col, label_col, id_col,
        bucket_length, num_hash_tables, seed,
    ).localCheckpoint(eager=False)
    truth = val.select(
        F.col(id_col).alias("test_id"), F.col(label_col).alias("_truth")
    )
    try:
        spark = train.sparkSession
        n_val = val.count()
        grid_df = spark.createDataFrame([(int(k),) for k in grid], "k int")
        # each neighbor row participates in every grid point with k >= rn
        cand = ranked.join(F.broadcast(grid_df), F.col("rn") <= F.col("k"))
        votes = cand.groupBy("k", "test_id", "n_label").agg(
            F.count(F.lit(1)).alias("votes"), F.min("_dist").alias("min_dist")
        )
        wv = W.partitionBy("k", "test_id").orderBy(
            F.col("votes").desc(), F.col("min_dist").asc(), F.col("n_label").asc()
        )
        pred = (
            votes.withColumn("vrn", F.row_number().over(wv))
            .filter(F.col("vrn") == 1)
            .select("k", "test_id", F.col("n_label").alias("prediction"))
        )
        # INNER join against truth then count correct per k: a val row
        # with zero LSH bucket collisions gets no prediction row and so
        # contributes 0 correct — dividing by the FULL |val| keeps the
        # GridSearchCV full-validation denominator (missing == incorrect).
        correct = (
            pred.join(F.broadcast(truth), "test_id")
            .groupBy("k")
            .agg(
                F.sum((F.col("prediction") == F.col("_truth")).cast("long")).alias(
                    "n_correct"
                )
            )
        )
        by_k = {int(r["k"]): int(r["n_correct"]) for r in correct.collect()}
        leaderboard = [(k, by_k.get(k, 0) / n_val if n_val else 0.0) for k in grid]
        best_k = max(leaderboard, key=lambda kv: (kv[1], -kv[0]))[0]
        return best_k, leaderboard
    finally:
        ranked.unpersist()
