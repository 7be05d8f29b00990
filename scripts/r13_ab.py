"""Same-JVM interleaved A/B for the r13 engine changes (guide §1: the
only timing comparison that survives ambient load).

Variants (old shape reconstructed inline, new shape = the committed
operators), interleaved old/new per round with the bench's GC + cache
discipline:

  ntile   : old eager-localCheckpoint + caller count() exact_ntile chain
            (rfm_segments shape) vs new lazy-checkpoint n=None chain
  quantile: same for quantile_binning (uncached input: count() scan vs none)
  ccnet   : same for ccnet_perplexity_buckets (incl. old nll cache)
  sq8     : old unpersisted stats (duplicated agg) vs new stats.persist()
  band    : old plain band self-join vs new hot/cold split (band_split
            default) on the llm_dataset_pipeline_neardup entry's operator
            configuration

Usage: python scripts/r13_ab.py <variantkey>[,<variantkey>...] [rounds]
Writes /tmp/r13_ab_<keys>.json; stdout a summary table.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window as W  # noqa: E402

from mlb_win_predictor_spark.session import (  # noqa: E402
    get_spark,
    load_table,
    persistent_rdd_count,
    release_caches,
)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


# ---------------------------------------------------------------- old shapes
def _old_ranged(df, order_cols):
    base = (
        df.repartitionByRange(*[F.col(c) for c in order_cols])
        if order_cols
        else df
    )
    return base.withColumn("_pid", F.spark_partition_id()).withColumn(
        "_mid", F.monotonically_increasing_id()
    )


def old_dense_global_index(df, order_cols=None, id_name="row_idx"):
    """The pre-r13 operator: EAGER localCheckpoint, then offsets collect."""
    if order_cols:
        w = W.partitionBy("_pid").orderBy(*[F.col(c).asc() for c in order_cols])
    else:
        w = W.partitionBy("_pid").orderBy(F.col("_mid").asc())
    part = _old_ranged(df, order_cols).localCheckpoint(eager=True)
    counts = sorted(
        (r._pid, r.n)
        for r in part.groupBy("_pid").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    offsets, acc = {}, 0
    for pid, n in counts:
        offsets[pid] = acc
        acc += n
    off_df = df.sparkSession.createDataFrame(
        [(int(p), int(o)) for p, o in offsets.items()], "_pid int, _offset long"
    )
    return (
        part.withColumn("_rn", F.row_number().over(w))
        .join(F.broadcast(off_df), "_pid")
        .withColumn(id_name, (F.col("_offset") + F.col("_rn") - 1).cast("long"))
        .drop("_pid", "_mid", "_rn", "_offset")
    )


def old_exact_ntile(df, order_cols, n, k, name):
    q, r = divmod(n, k)
    idx = F.col("_ntile_idx")
    if q == 0:
        b = idx + 1
    else:
        head = r * (q + 1)
        b = F.when(idx < head, F.floor(idx / (q + 1)) + 1).otherwise(
            r + F.floor((idx - head) / q) + 1
        )
    return (
        old_dense_global_index(df, order_cols, id_name="_ntile_idx")
        .withColumn(name, b.cast("int"))
        .drop("_ntile_idx")
    )


def _rfm_user_table(spark):
    e = load_table(spark, SF, "events")
    mx = e.agg(F.max(F.to_date("ts")).alias("mx"))
    return (
        e.groupBy("user_id")
        .agg(
            F.max(F.to_date("ts")).alias("last_day"),
            F.count(F.lit(1)).alias("freq"),
            F.sum(F.col("value").cast("decimal(18,4)")).alias("monetary"),
        )
        .crossJoin(F.broadcast(mx))
        .select(
            "user_id",
            F.datediff("mx", "last_day").alias("r_days"),
            "freq",
            "monetary",
        )
    )


def _rfm_rollup(u):
    seg = F.concat(
        F.lit("R"), F.col("r_score").cast("string"),
        F.lit("F"), F.col("f_score").cast("string"),
        F.lit("M"), F.col("m_score").cast("string"),
    )
    from mlb_win_predictor_spark.functions.scalars import stable_round

    return (
        u.select(seg.alias("segment"), "r_days", "freq", "monetary")
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            stable_round(F.avg(F.col("r_days").cast("double")), 4).alias("a"),
            stable_round(F.avg(F.col("freq").cast("double")), 4).alias("b"),
            stable_round(F.sum("monetary").cast("double"), 4).alias("c"),
        )
    )


def ntile_old(spark):
    u = _rfm_user_table(spark).cache()
    n = u.count()
    u = old_exact_ntile(u, ["r_days", "user_id"], n, 3, "r_score")
    u = old_exact_ntile(u, ["freq", "user_id"], n, 3, "f_score")
    u = old_exact_ntile(u, ["monetary", "user_id"], n, 3, "m_score")
    return _rfm_rollup(u)


def ntile_new(spark):
    from mlb_win_predictor_spark.queries.ops import rfm_segments

    return rfm_segments(spark, SF)


def quantile_old(spark):
    o = load_table(spark, SF, "orders").select("o_totalprice", "o_orderkey")
    n = o.count()
    binned = old_exact_ntile(
        o, ["o_totalprice", "o_orderkey"], n, 10, "bin_i"
    ).select("o_totalprice", F.col("bin_i").cast("bigint").alias("bin"))
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("o_totalprice").alias("lo"),
        F.max("o_totalprice").alias("hi"),
    )


def quantile_new(spark):
    from mlb_win_predictor_spark.queries.ops import quantile_binning

    return quantile_binning(spark, SF)


def ccnet_old(spark):
    from mlb_win_predictor_spark.functions.scalars import md5_int32
    from mlb_win_predictor_spark.queries.text import (
        CCNET_BUCKET_NAMES,
        CCNET_KEEP_PCT,
        unigram_logprob_quality,
    )
    from mlb_win_predictor_spark.functions.scalars import stable_round

    nll = unigram_logprob_quality(spark, SF).select("doc_id", "avg_nll").cache()
    n = nll.count()
    binned = old_exact_ntile(nll, ["avg_nll", "doc_id"], n, 3, "bucket_id").select(
        "doc_id", "avg_nll", "bucket_id"
    )
    hashv = md5_int32(F.col("doc_id").cast("string"))
    keep_pct = (
        F.when(F.col("bucket_id") == 1, F.lit(CCNET_KEEP_PCT[1]))
        .when(F.col("bucket_id") == 2, F.lit(CCNET_KEEP_PCT[2]))
        .otherwise(F.lit(CCNET_KEEP_PCT[3]))
        .cast("long")
    )
    kept = (hashv * 100 < keep_pct * F.lit(4294967296)).cast("long")
    bucket = (
        F.when(F.col("bucket_id") == 1, F.lit(CCNET_BUCKET_NAMES[1]))
        .when(F.col("bucket_id") == 2, F.lit(CCNET_BUCKET_NAMES[2]))
        .otherwise(F.lit(CCNET_BUCKET_NAMES[3]))
    )
    return (
        binned.select(
            "bucket_id", bucket.alias("bucket"), "avg_nll", kept.alias("k")
        )
        .groupBy("bucket_id", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("k").alias("n_kept"),
            stable_round(F.min("avg_nll"), 6).alias("mn"),
            stable_round(F.max("avg_nll"), 6).alias("mx"),
        )
    )


def ccnet_new(spark):
    from mlb_win_predictor_spark.queries.text import ccnet_perplexity_buckets

    return ccnet_perplexity_buckets(spark, SF)


def sq8_variant(spark, persist_stats: bool):
    """similarity_sq8_rerank with/without the stats persist — rebuilt
    inline so both variants live in one JVM (the committed entry is the
    persist_stats=True shape)."""
    from mlb_win_predictor_spark.queries.embeddings import (
        SQ8_N_QUERIES,
        SQ8_POOL,
        _dot,
    )
    from mlb_win_predictor_spark.functions.scalars import stable_round

    e = load_table(spark, SF, "embeddings")
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
    if persist_stats:
        stats = stats.persist()
    rng = F.zip_with(
        F.col("mx_arr"), F.col("mn_arr"),
        lambda a, b: a.cast("double") - b.cast("double"),
    )
    shifted = F.zip_with(
        F.col("embedding"), F.col("mn_arr"),
        lambda v, m: v.cast("double") - m.cast("double"),
    )
    code = F.zip_with(shifted, rng, lambda d, r: F.round(d / r * 255) - 128)
    deq = F.zip_with(
        F.zip_with(code, rng, lambda cd, r: (cd + 128) / 255.0 * r),
        F.col("mn_arr"),
        lambda t, m: m.cast("double") + t,
    )
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
    wr = W.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("cand_id").asc()
    )
    return (
        exact.withColumn("rnk", F.row_number().over(wr))
        .filter(F.col("rnk") <= 3)
        .select(
            "query_id", F.col("rnk").cast("long").alias("rnk"), "cand_id",
            "cosine", "sq8_cosine",
        )
    )


def sq8_old(spark):
    return sq8_variant(spark, persist_stats=False)


def sq8_new(spark):
    from mlb_win_predictor_spark.queries.embeddings import similarity_sq8_rerank

    return similarity_sq8_rerank(spark, SF)


def _old_band_candidate_pairs(sh, id_col="doc_id", num_hashes=32, bands=8,
                              seed=42, hash_family="xxhash64"):
    """The pre-r13 plain band self-join."""
    from mlb_win_predictor_spark.operators.dedup import minhash_signatures

    r = num_hashes // bands
    mins = minhash_signatures(
        sh, id_col, num_hashes=num_hashes, seed=seed, hash_family=hash_family
    ).persist()
    if hash_family == "md5":
        band_cols = [
            F.concat_ws("-", *[F.col(f"h{j * r + k}") for k in range(r)])
            for j in range(bands)
        ]
    else:
        band_cols = [
            F.xxhash64(F.array(*[F.col(f"h{j * r + k}") for k in range(r)]))
            for j in range(bands)
        ]
    band_rows = mins.select(
        F.col(id_col),
        F.posexplode(F.array(*band_cols)).alias("band_idx", "band_sig"),
    )
    return (
        band_rows.alias("a")
        .join(
            band_rows.alias("b"),
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


def _banded_pairs_shape(spark, old: bool):
    """minhash_banded_pairs with the old vs new candidate generator —
    mirrors the operator body (shingle hash + persist + exact re-check)."""
    from mlb_win_predictor_spark.operators.dedup import (
        _shingle_hash,
        band_candidate_pairs,
        ngram_shingles,
    )
    from mlb_win_predictor_spark.session import fan_out

    docs = fan_out(load_table(spark, SF, "documents"))
    sh = ngram_shingles(docs.select("doc_id", "text"), "text", 3).select(
        "doc_id",
        F.transform("shingles", lambda s: _shingle_hash(s, "md5")).alias(
            "shingles"
        ),
    ).persist()
    cand = (
        _old_band_candidate_pairs(sh, hash_family="md5")
        if old
        else band_candidate_pairs(sh, hash_family="md5")
    )
    sa = sh.select(F.col("doc_id").alias("id_a"), F.col("shingles").alias("sh_a"))
    sb = sh.select(F.col("doc_id").alias("id_b"), F.col("shingles").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .select("id_a", "id_b", (inter / union).alias("jaccard"))
        .filter(F.col("jaccard") >= 0.5)
    )


def band_old(spark):
    return _banded_pairs_shape(spark, old=True)


def band_new(spark):
    return _banded_pairs_shape(spark, old=False)


def _old_pagerank(edges, iterations=5, damping=0.85, checkpoint_every=2):
    """The pre-r13 loop shape: step() crossJoins a 1-row dangling-mass
    frame EVEN when the graph has no dangling nodes (constant +0.0).
    tol=None path only — exactly the entry's configuration."""
    from pyspark.sql.window import Window

    from mlb_win_predictor_spark.session import release_checkpoint

    links = (
        edges.select("src", "dst")
        .repartition("src")
        .dropDuplicates(["src", "dst"])
        .withColumn("deg", F.count(F.lit(1)).over(Window.partitionBy("src")))
        .persist()
    )
    links.count()
    nodes = (
        links.select(F.col("src").alias("node"))
        .union(links.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n_nodes = nodes.count()
    dangling_nodes = nodes.join(
        links.select(F.col("src").alias("node")).distinct(), "node", "left_anti"
    ).persist()
    has_dangling = dangling_nodes.count() > 0

    def step(cur):
        if has_dangling:
            dangling = (
                cur.join(F.broadcast(dangling_nodes), "node", "leftsemi")
                .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dangling_mass"))
            )
        else:
            dangling = cur.sparkSession.range(1).select(
                F.lit(0.0).alias("dangling_mass")
            )
        contribs = (
            cur.join(links, cur["node"] == links["src"])
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("deg")).alias("contrib"))
        )
        return (
            nodes.join(contribs, nodes["node"] == contribs["dst"], "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n_nodes)
                    + F.lit(damping) * F.col("dangling_mass") / F.lit(float(n_nodes))
                    + F.lit(damping) * F.coalesce(F.col("contrib"), F.lit(0.0))
                ).alias("rank"),
            )
        )

    ranks = nodes.select("node", F.lit(1.0 / n_nodes).alias("rank"))
    prev_ck = None
    done = 0
    while done < iterations:
        steps = min(max(checkpoint_every, 1), iterations - done)
        new_ranks = ranks
        for _ in range(steps):
            new_ranks = step(new_ranks)
        ck = new_ranks.localCheckpoint(eager=True)
        ranks = ck
        if prev_ck is not None:
            release_checkpoint(prev_ck)
        prev_ck = ck
        done += steps
    links.unpersist()
    nodes.unpersist()
    dangling_nodes.unpersist()
    return ranks


def _pagerank_edges(spark):
    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_partkey")
    parts = li.groupBy("l_orderkey").agg(F.collect_set("l_partkey").alias("ps"))
    return (
        parts.select(F.explode("ps").alias("src"), "ps")
        .select("src", F.explode("ps").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
    )


def prdangle_old(spark):
    from mlb_win_predictor_spark.functions.scalars import stable_round

    ranks = _old_pagerank(_pagerank_edges(spark))
    return (
        ranks.select(
            "node", stable_round(F.col("rank") * 1000, 6).alias("rank_permille")
        )
        .orderBy(F.desc("rank_permille"), "node")
        .limit(20)
    )


def prdangle_new(spark):
    from mlb_win_predictor_spark.queries.ops import pagerank_copurchase

    return pagerank_copurchase(spark, SF)


def _knn_entry(spark):
    from mlb_win_predictor_spark.queries.ml import ml_knn_k_leaderboard

    return ml_knn_k_leaderboard(spark, SF)


def knn_old(spark):
    """Entry with the checkpoint forced EAGER (the pre-r13 behavior) via
    a scoped monkeypatch of DataFrame.localCheckpoint."""
    from pyspark.sql import DataFrame as _DF

    orig = _DF.localCheckpoint

    def eager_ck(self, eager=True):
        return orig(self, eager=True)

    _DF.localCheckpoint = eager_ck
    try:
        return _knn_entry(spark)
    finally:
        _DF.localCheckpoint = orig


def knn_new(spark):
    return _knn_entry(spark)


VARIANTS = {
    "ntile": (ntile_old, ntile_new),
    "quantile": (quantile_old, quantile_new),
    "ccnet": (ccnet_old, ccnet_new),
    "sq8": (sq8_old, sq8_new),
    "band": (band_old, band_new),
    "knn": (knn_old, knn_new),
    "prdangle": (prdangle_old, prdangle_new),
}


def timed(spark, fn) -> float:
    gc.collect()
    spark.sparkContext._jvm.System.gc()
    try:
        t0 = time.perf_counter()
        n = fn(spark).count()
        dt = time.perf_counter() - t0
        assert n >= 0
    finally:
        release_caches(spark)
    assert persistent_rdd_count(spark) == 0
    return dt


def main():
    keys = (sys.argv[1] if len(sys.argv) > 1 else "ntile").split(",")
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark(app_name="r13-ab")
    out = {}
    # warmup both shapes once at the smallest SF? — run at target SF once
    for key in keys:
        old_fn, new_fn = VARIANTS[key]
        timed(spark, old_fn)
        timed(spark, new_fn)
        olds, news = [], []
        for i in range(rounds):
            # alternate order each round so drift cancels
            if i % 2 == 0:
                olds.append(timed(spark, old_fn))
                news.append(timed(spark, new_fn))
            else:
                news.append(timed(spark, new_fn))
                olds.append(timed(spark, old_fn))
        def med3(xs):
            s = sorted(xs)[:3]
            return s[len(s) // 2]
        out[key] = {
            "old": [round(x, 3) for x in olds],
            "new": [round(x, 3) for x in news],
            "old_med_fastest3": round(med3(olds), 3),
            "new_med_fastest3": round(med3(news), 3),
        }
        print(key, json.dumps(out[key]), flush=True)
    path = f"/tmp/r13_ab_{'_'.join(keys)}.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
