"""SCD2 / CDC-apply operator tests (the history-preserving dual of the
reference's UPDATE-in-place, src/function.py:480)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from mlb_win_predictor_spark.operators.scd import scd2_apply


def _state(spark, rows):
    return spark.createDataFrame(
        rows, "team_id long, team_name string, valid_from timestamp, valid_to timestamp"
    )


def _updates(spark, rows):
    return spark.createDataFrame(rows, "team_id long, team_name string, effective_ts timestamp")


TS = datetime.datetime


def test_scd2_apply_semantics(spark):
    cur = _state(
        spark,
        [
            (1, "Oldtown A", TS(2020, 1, 1), TS(2022, 1, 1)),  # closed history
            (1, "Newtown A", TS(2022, 1, 1), None),            # open
            (2, "Team B", TS(2020, 1, 1), None),               # open, unchanged
            (3, "Team C", TS(2020, 1, 1), None),               # open, no-op update
        ],
    )
    upd = _updates(
        spark,
        [
            (1, "Renamed A", TS(2023, 6, 1)),   # change -> close + new version
            (3, "Team C", TS(2023, 6, 1)),      # identical attrs -> no-op
            (4, "Team D", TS(2023, 6, 1)),      # brand-new key -> insert open
            (4, "Team D old", TS(2023, 5, 1)),  # stale duplicate, must lose
        ],
    )
    out = scd2_apply(cur, upd, "team_id", ["team_name"])
    rows = {(r.team_id, r.team_name): (r.valid_from, r.valid_to) for r in out.collect()}

    assert rows[(1, "Oldtown A")] == (TS(2020, 1, 1), TS(2022, 1, 1))      # untouched
    assert rows[(1, "Newtown A")] == (TS(2022, 1, 1), TS(2023, 6, 1))      # closed
    assert rows[(1, "Renamed A")] == (TS(2023, 6, 1), None)                # new open
    assert rows[(2, "Team B")] == (TS(2020, 1, 1), None)                   # untouched open
    assert rows[(3, "Team C")] == (TS(2020, 1, 1), None)                   # no-op kept open
    assert rows[(4, "Team D")] == (TS(2023, 6, 1), None)                   # insert
    assert ("4", "Team D old") not in rows
    assert out.count() == 6
    # invariant: exactly one open row per live key
    opens = out.filter(F.col("valid_to").isNull()).groupBy("team_id").count()
    assert opens.filter(F.col("count") > 1).count() == 0


def test_scd2_idempotent_on_reapply(spark):
    cur = _state(spark, [(1, "A", TS(2020, 1, 1), None)])
    upd = _updates(spark, [(1, "B", TS(2021, 1, 1))])
    once = scd2_apply(cur, upd, "team_id", ["team_name"])
    twice = scd2_apply(once, upd, "team_id", ["team_name"])
    assert sorted(map(str, once.collect())) == sorted(map(str, twice.collect()))
