"""Unit/property tests for the scalar expression library (SURVEY §5.2):
IP-decode roundtrip, guarded division never yields inf, formatting."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mlb_win_predictor_spark.functions import scalars as S


def _eval(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0].v


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("123.2", 123.6),
        ("123.1", 123.3),
        ("123.0", 123.0),
        ("123", 123.0),
        ("0.2", 0.6),
        ("7.3", None),  # 3 outs in the fraction is invalid base-3 coding
        ("garbage", None),
        ("", None),
    ],
)
def test_decode_ip_str(spark, raw, expected):
    got = _eval(spark, S.decode_ip_str(F.lit(raw)))
    assert got == pytest.approx(expected) if expected is not None else got is None


def test_decode_ip_roundtrip_all_outs(spark):
    """D6 property: every (whole, outs in {0,1,2}) encodes+decodes exactly."""
    df = spark.range(200).select(
        (F.col("id") / 3).cast("long").alias("whole"), (F.col("id") % 3).alias("outs")
    )
    enc = F.concat(F.col("whole").cast("string"), F.lit("."), F.col("outs").cast("string"))
    out = df.select(
        "whole",
        "outs",
        S.decode_ip_str(enc).alias("dec"),
    ).collect()
    for r in out:
        assert r.dec == pytest.approx(r.whole + r.outs * 3 / 10)


def test_guarded_div_never_inf(spark):
    df = spark.createDataFrame(
        [(1.0, 0.0), (1.0, None), (None, 2.0), (3.0, 2.0), (0.0, 0.0)],
        ["num", "den"],
    )
    rows = df.select(S.guarded_div("num", "den").alias("r")).collect()
    vals = [r.r for r in rows]
    assert vals[0] is None and vals[1] is None and vals[2] is None
    assert vals[3] == 1.5 and vals[4] is None
    assert not any(v is not None and abs(v) == float("inf") for v in vals)


def test_formatting_and_label(spark):
    assert _eval(spark, S.era_fmt(F.lit("3.14159"))) == 3.14
    assert _eval(spark, S.win_pct_fmt(F.lit(0.66666))) == 0.667
    assert _eval(spark, S.home_win_label(F.lit(108), F.lit(108))) == 1
    assert _eval(spark, S.home_win_label(F.lit(109), F.lit(108))) == 0
    assert _eval(spark, S.home_win_label(F.lit(None), F.lit(108))) == 0
    assert _eval(spark, S.html_li(F.lit("x"))) == "<li>x</li>"


def test_s3_log_key_shape(spark):
    got = _eval(
        spark,
        S.s3_log_key(F.lit("2023-08-25 05:00:01").cast("timestamp"), "_prepared_games"),
    )
    assert got == "2023-08-25_05-00-01_prepared_games"
