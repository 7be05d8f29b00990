"""E1/E2 games-pipeline replica tests over reference-shaped fixtures
(FIXTURES.md): DuckDB parity for the feature build + as-of stats, funnel
shape, and MERGE semantics."""

from __future__ import annotations

import duckdb
import pytest

from mlb_win_predictor_spark.fixtures import write_fixtures
from mlb_win_predictor_spark.pipeline import (
    asof_pitcher_stats,
    build_features,
    prediction_features,
    score_games,
    update_games,
)
from mlb_win_predictor_spark.queries.base import QueryDef  # noqa: F401  (import check)

from .oracle import compare


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("fixtures")
    write_fixtures(str(d))
    return str(d)


@pytest.fixture(scope="module")
def fcon(fixture_dir):
    con = duckdb.connect()
    for t in ("games", "players", "teams", "pitching_log", "game_results"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{fixture_dir}/{t}.parquet')"
        )
    yield con
    con.close()


def load(spark, fixture_dir, name):
    return spark.read.parquet(f"{fixture_dir}/{name}.parquet")


DIFFS = [
    "era",
    "win_percentage",
    "wins",
    "losses",
    "innings_pitched",
    "k_nine",
    "bb_nine",
    "k_bb_diff",
    "whip",
    "babip",
    "k_bb_ratio",
]

FEATURE_SQL = """
WITH dropped AS (
  SELECT game_id, home_team_id, away_team_id, winning_team,
         {stat_cols}
  FROM games
), nn1 AS (
  SELECT * FROM dropped WHERE {all_not_null}
), ratioed AS (
  SELECT *,
    CASE WHEN home_pitcher_bb_nine = 0 THEN NULL
         ELSE home_pitcher_k_nine / home_pitcher_bb_nine END AS home_pitcher_k_bb_ratio,
    CASE WHEN away_pitcher_bb_nine = 0 THEN NULL
         ELSE away_pitcher_k_nine / away_pitcher_bb_nine END AS away_pitcher_k_bb_ratio
  FROM nn1
), nn2 AS (
  SELECT * FROM ratioed
  WHERE home_pitcher_k_bb_ratio IS NOT NULL AND away_pitcher_k_bb_ratio IS NOT NULL
)
SELECT {diff_cols},
       CASE WHEN winning_team = home_team_id THEN 1 ELSE 0 END AS winning_team
FROM nn2
"""


def _feature_sql() -> str:
    stat_base = [
        f"{s}_pitcher_{c}"
        for s in ("home", "away")
        for c in DIFFS[:-1]
    ]
    return FEATURE_SQL.format(
        stat_cols=", ".join(stat_base),
        all_not_null=" AND ".join(
            f"{c} IS NOT NULL"
            for c in ["game_id", "home_team_id", "away_team_id", "winning_team", *stat_base]
        ),
        diff_cols=",\n       ".join(
            f"away_pitcher_{c} - home_pitcher_{c} AS pitcher_{c}_comp" for c in DIFFS
        ),
    )


def test_build_features_duckdb_parity(spark, fixture_dir, fcon):
    out = build_features(load(spark, fixture_dir, "games"))
    compare(out, fcon, _feature_sql())


def test_funnel_shape(spark, fixture_dir):
    games = load(spark, fixture_dir, "games")
    raw = games.count()
    out = build_features(games)
    final = out.count()
    assert raw == 2000
    # golden counts (seed 42, SURVEY §5.2): the funnel mirrors the
    # reference's 2129→1693→1673 shape — dropna cuts 2000→1756 (stat-block
    # + outcome nulls), the guarded-ratio nulls cut →1643
    assert final == 1643
    assert out.columns == [f"pitcher_{c}_comp" for c in DIFFS] + ["winning_team"]


def test_asof_pitcher_stats_duckdb_parity(spark, fixture_dir, fcon):
    out = asof_pitcher_stats(load(spark, fixture_dir, "pitching_log"))
    sql = """
    WITH c AS (
      SELECT pitcher_id, game_id, game_date,
             COUNT(*) OVER w AS prior_appearances,
             SUM(CAST(outs_recorded AS DOUBLE)) OVER w / 3.0 AS ip,
             SUM(CAST(strikeouts AS DOUBLE)) OVER w AS so,
             SUM(CAST(walks AS DOUBLE)) OVER w AS bb,
             SUM(CAST(hits AS DOUBLE)) OVER w AS h,
             SUM(CAST(home_runs AS DOUBLE)) OVER w AS hr,
             SUM(CAST(at_bats AS DOUBLE)) OVER w AS ab,
             SUM(CAST(sac_flies AS DOUBLE)) OVER w AS sf,
             SUM(CAST(earned_runs AS DOUBLE)) OVER w AS er,
             SUM(CAST(batters_faced AS DOUBLE)) OVER w AS bf,
             SUM(CAST(won AS DOUBLE)) OVER w AS wins,
             SUM(CAST(lost AS DOUBLE)) OVER w AS losses
      FROM pitching_log
      WINDOW w AS (PARTITION BY pitcher_id ORDER BY game_date ASC, game_id ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    )
    SELECT pitcher_id, game_id, game_date, prior_appearances,
           (ROUND((CASE WHEN ip IS NULL OR ip = 0 THEN NULL ELSE 9.0*er/ip END) * 1e2) / 1e2) AS era,
           (ROUND((CASE WHEN wins+losses IS NULL OR wins+losses = 0 THEN NULL
                      ELSE wins/(wins+losses) END) * 1e3) / 1e3) AS win_percentage,
           wins, losses,
           (ROUND(ip * 1e6) / 1e6) AS innings_pitched,
           (ROUND((CASE WHEN ip IS NULL OR ip = 0 THEN NULL ELSE 9.0*so/ip END) * 1e6) / 1e6) AS k_nine,
           (ROUND((CASE WHEN ip IS NULL OR ip = 0 THEN NULL ELSE 9.0*bb/ip END) * 1e6) / 1e6) AS bb_nine,
           (ROUND((CASE WHEN bf IS NULL OR bf = 0 THEN NULL ELSE so/bf END
               - CASE WHEN bf IS NULL OR bf = 0 THEN NULL ELSE bb/bf END) * 1e6) / 1e6) AS k_bb_diff,
           (ROUND((CASE WHEN ip IS NULL OR ip = 0 THEN NULL ELSE (h+bb)/ip END) * 1e6) / 1e6) AS whip,
           (ROUND((CASE WHEN ab-so-hr+sf IS NULL OR ab-so-hr+sf = 0 THEN NULL
                      ELSE (h-hr)/(ab-so-hr+sf) END) * 1e6) / 1e6) AS babip
    FROM c
    """
    compare(out, fcon, sql)


def test_prediction_features_funnel_parity(spark, fixture_dir):
    """The inference funnel keeps EXACTLY the labeled funnel's rows when
    restricted to decided games (same drop/dropna/ratio gates), and keeps
    strictly more rows over the full slate (label no longer required)."""
    from pyspark.sql import functions as F

    games = load(spark, fixture_dir, "games")
    decided = games.filter(F.col("winning_team").isNotNull())
    assert prediction_features(decided).count() == build_features(decided).count()
    assert prediction_features(games).count() >= build_features(games).count()
    cols = prediction_features(games).columns
    assert cols[:3] == ["game_id", "home_team_id", "away_team_id"]
    assert cols[3:] == [f"pitcher_{c}_comp" for c in DIFFS]


def test_score_games_e2e_train_save_reload_merge(spark, fixture_dir, tmp_path):
    """The reference's 2024+ production loop (README.md:24) end-to-end:
    train on decided games → save → RELOAD from disk → score the slate →
    MERGE predicted_winner back. Invariants: schema/row preservation,
    every scored pick ∈ {home_team_id, away_team_id}, funnel-rejected
    rows keep their old prediction, and the whole loop is deterministic."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.sql import functions as F

    from mlb_win_predictor_spark.ml.train import make_pipeline
    from mlb_win_predictor_spark.pipeline.games import FEATURE_COLS, LABEL_COL

    games = load(spark, fixture_dir, "games")
    decided = games.filter(F.col("winning_team").isNotNull())
    feats = (
        build_features(decided)
        .withColumn("label", F.col(LABEL_COL).cast("double"))
        .drop(LABEL_COL)
    )
    pipe = make_pipeline(
        FEATURE_COLS, LogisticRegression(featuresCol="features", labelCol="label")
    )
    mdir = str(tmp_path / "model")
    pipe.fit(feats).write().overwrite().save(mdir)

    scored = score_games(games, mdir)
    # MERGE semantics: nothing dropped/appended, schema unchanged
    assert scored.count() == games.count()
    assert scored.columns == games.columns
    # every fresh prediction names one of the two teams playing
    fresh_ids = prediction_features(games).select("game_id")
    fresh = scored.join(fresh_ids, "game_id", "left_semi")
    assert fresh.count() == fresh_ids.count()
    bad = fresh.filter(
        F.col("predicted_winner").isNull()
        | (
            (F.col("predicted_winner") != F.col("home_team_id"))
            & (F.col("predicted_winner") != F.col("away_team_id"))
        )
    ).count()
    assert bad == 0
    # funnel-rejected rows keep their prior prediction verbatim
    stale = scored.join(fresh_ids, "game_id", "left_anti")
    orig = games.join(fresh_ids, "game_id", "left_anti")
    assert (
        stale.select("game_id", "predicted_winner")
        .exceptAll(orig.select("game_id", "predicted_winner"))
        .count()
        == 0
    )
    # deterministic: a second score pass (same saved model) is identical
    again = score_games(games, mdir)
    assert (
        scored.select("game_id", "predicted_winner")
        .exceptAll(again.select("game_id", "predicted_winner"))
        .count()
        == 0
    )


def test_update_games_merge_semantics(spark, fixture_dir):
    games = load(spark, fixture_dir, "games")
    results = load(spark, fixture_dir, "game_results")
    teams = load(spark, fixture_dir, "teams")
    merged = update_games(games, results, teams)
    # row count preserved (unmatched results dropped, dup results deduped)
    assert merged.count() == games.count()
    assert merged.columns == games.columns
    # every matched game now carries the result's team id (home team by
    # fixture construction)
    matched = merged.join(
        results.select("game_id").distinct(), "game_id", "left_semi"
    )
    from pyspark.sql import functions as F

    bad = matched.filter(
        (F.col("winning_team").isNull())
        | (F.col("winning_team") != F.col("home_team_id"))
    ).count()
    assert bad == 0
    # unmatched games keep their original outcome
    untouched = merged.join(results.select("game_id").distinct(), "game_id", "left_anti")
    orig = games.join(results.select("game_id").distinct(), "game_id", "left_anti")
    assert (
        untouched.select("game_id", "winning_team").exceptAll(
            orig.select("game_id", "winning_team")
        ).count()
        == 0
    )
