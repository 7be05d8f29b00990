"""Dump .explain('formatted') for headline entries to plans/r13/.

Usage: python scripts/dump_r13_plans.py [before|after] [name,name,...]

Same contract as scripts/dump_r12_plans.py (plans captured at sf0.01;
plan SHAPE is what the round reasons about), plus the r12-verdict #5
closure: a dedicated dump of the PageRank links-build plan BEFORE the
operator's persist/checkpoint consumes it — the r12 before/after plans
truncated at the localCheckpoint boundary, so the 1-scan/1-exchange
claim for the r12 edge-build rewrite was code-trust only. The witness
hook hands out the REAL `links` frame the executed loop uses, so the
dumped plan cannot drift from the code.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from mlb_win_predictor_spark.queries import QUERIES  # noqa: E402
from mlb_win_predictor_spark.session import get_spark, release_caches  # noqa: E402


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def dump_pagerank_links(spark, sf: str, outdir: str, stage: str) -> None:
    """Dump the links-build plan (pre-persist) via the operator's witness
    hook — mirrors pagerank_copurchase's edge build exactly."""
    from pyspark.sql import functions as F

    from mlb_win_predictor_spark.operators.graph import pagerank
    from mlb_win_predictor_spark.session import load_table

    li = load_table(spark, sf, "lineitem").select("l_orderkey", "l_partkey")
    parts = li.groupBy("l_orderkey").agg(F.collect_set("l_partkey").alias("ps"))
    edges = (
        parts.select(F.explode("ps").alias("src"), "ps")
        .select("src", F.explode("ps").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
    )
    witness: dict = {}
    try:
        pagerank(edges, iterations=1, tol=None, witness=witness)
        # `links` was persisted by the operator, so its explain wraps the
        # build plan in an InMemoryRelation — the child plan inside IS
        # the pre-checkpoint links build (scan count, exchange count,
        # sort count all visible).
        txt = plan_of(witness["links"])
    finally:
        release_caches(spark)
    with open(
        os.path.join(outdir, f"pagerank_copurchase_links_build_{stage}.txt"), "w"
    ) as fh:
        fh.write(
            f"# pagerank_copurchase links build — explain('formatted') of the\n"
            f"# operator's REAL `links` frame (witness hook) at {sf} ({stage}, r13).\n"
            f"# The InMemoryRelation child is the pre-persist build plan.\n"
        )
        fh.write(txt)
    print("pagerank_copurchase_links_build", flush=True)


def dump_pagerank_loop_body(spark, sf: str, outdir: str, stage: str) -> None:
    """Dump the loop body's pre-checkpoint plan (first chained-step frame)
    via the operator's `first_chain` witness key — the returned frame's
    explain truncates at the localCheckpoint boundary, so per-step plan
    claims (crossJoin count, exchange count) are only verifiable here."""
    from pyspark.sql import functions as F

    from mlb_win_predictor_spark.operators.graph import pagerank
    from mlb_win_predictor_spark.session import load_table

    li = load_table(spark, sf, "lineitem").select("l_orderkey", "l_partkey")
    parts = li.groupBy("l_orderkey").agg(F.collect_set("l_partkey").alias("ps"))
    edges = (
        parts.select(F.explode("ps").alias("src"), "ps")
        .select("src", F.explode("ps").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
    )
    witness: dict = {}
    try:
        # same chaining as the entry so the dumped chain is the entry's
        pagerank(edges, iterations=2, tol=None, checkpoint_every=2, witness=witness)
        txt = plan_of(witness["first_chain"])
    finally:
        release_caches(spark)
    with open(
        os.path.join(outdir, f"pagerank_copurchase_loop_body_{stage}.txt"), "w"
    ) as fh:
        fh.write(
            f"# pagerank_copurchase loop body — explain('formatted') of the REAL\n"
            f"# first 2-step chain BEFORE its localCheckpoint (witness hook) at\n"
            f"# {sf} ({stage}, r13). checkpoint_every=2 as in the entry.\n"
        )
        fh.write(txt)
    print("pagerank_copurchase_loop_body", flush=True)


def main() -> None:
    stage = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = (
        [n for n in sys.argv[2].split(",") if n in QUERIES]
        if len(sys.argv) > 2
        else [n for n in HEADLINE if n in QUERIES]
    )
    spark = get_spark(app_name="r13-plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    sf = os.environ.get("PLAN_SF_DIR", "/root/testdata/sf0.01")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    outdir = os.path.join(repo, "plans", "r13")
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        try:
            df = QUERIES[name].fn(spark, sf)
            txt = plan_of(df)
        except Exception as e:  # pragma: no cover - diagnostic path
            txt = f"ERROR dumping plan: {e}\n"
        finally:
            release_caches(spark)
        with open(os.path.join(outdir, f"{name}_{stage}.txt"), "w") as fh:
            fh.write(f"# {name} — explain('formatted') at {sf} ({stage}, r13)\n")
            fh.write(txt)
        print(name, flush=True)
    if "pagerank_copurchase" in names:
        dump_pagerank_links(spark, sf, outdir, stage)
        dump_pagerank_loop_body(spark, sf, outdir, stage)


if __name__ == "__main__":
    main()
