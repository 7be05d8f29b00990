"""Dump .explain('formatted') for headline entries to plans/r12/.

Usage: python scripts/dump_r12_plans.py [before|after] [name,name,...]

Default stage 'before' writes plans/r12/<name>_before.txt for every
bench.py HEADLINE entry (or the given subset). Plans are captured at
sf0.01 — plan SHAPE (exchanges, join strategy, pushed filters, Python
nodes) is what the optimization round reasons about, and it is identical
to sf0.1 modulo AQE's runtime stats. Entries that EXECUTE on call and
return a materialized/local result (streaming capstones, iterative
checkpoint returners) still dump — their visible plan is the terminal
scan — and are annotated as such.
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


def main() -> None:
    stage = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = (
        [n for n in sys.argv[2].split(",") if n in QUERIES]
        if len(sys.argv) > 2
        else [n for n in HEADLINE if n in QUERIES]
    )
    spark = get_spark(app_name="r12-plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    sf = os.environ.get("PLAN_SF_DIR", "/root/testdata/sf0.01")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    outdir = os.path.join(repo, "plans", "r12")
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        try:
            df = QUERIES[name].fn(spark, sf)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            txt = buf.getvalue()
        except Exception as e:  # pragma: no cover - diagnostic path
            txt = f"ERROR dumping plan: {e}\n"
        finally:
            release_caches(spark)
        with open(os.path.join(outdir, f"{name}_{stage}.txt"), "w") as fh:
            fh.write(f"# {name} — explain('formatted') at {sf} ({stage}, r12)\n")
            fh.write(txt)
        print(name, flush=True)


if __name__ == "__main__":
    main()
