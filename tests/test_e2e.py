"""End-to-end lifecycle test: the full reference workload (E1 -> E2 -> E3,
SURVEY §3) as one flow — a user of the reference switching to this engine
runs exactly this.

schedule source -> prepare (dim + as-of enrichment) -> outcomes arrive ->
update (MERGE) -> feature build -> train -> select -> save -> reload.
"""

from __future__ import annotations

import datetime
import os

import pytest
from pyspark.sql import functions as F

from mlb_win_predictor_spark.fixtures import write_fixtures
from mlb_win_predictor_spark.ml.train import (
    evaluate_predictions,
    make_pipeline,
    MODELS,
    select_best,
    train_leaderboard,
)
from mlb_win_predictor_spark.pipeline import (
    asof_pitcher_stats,
    build_features,
    prepare_games,
    update_games,
)
from mlb_win_predictor_spark.sources import register_schedule_source


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("e2e")
    write_fixtures(str(d))
    return str(d)


def test_full_lifecycle(spark, fixture_dir, tmp_path_factory):
    out_root = str(tmp_path_factory.mktemp("e2e_out"))
    players = spark.read.parquet(f"{fixture_dir}/players.parquet")
    teams = spark.read.parquet(f"{fixture_dir}/teams.parquet")
    plog = spark.read.parquet(f"{fixture_dir}/pitching_log.parquet")

    # --- E1 phase 2: prepare today's games from the schedule source
    register_schedule_source(spark)
    sched = spark.read.format("mlb_schedule").option("date", "8/25/2023").load()
    stats = asof_pitcher_stats(plog)
    prepared = prepare_games(sched, players, stats, datetime.date(2023, 8, 25))
    games_path = os.path.join(out_root, "games")
    base = spark.read.parquet(f"{fixture_dir}/games.parquet")
    prepared_aligned = prepared.select(
        "game_id", "home_team_id", "away_team_id",
        *[c for c in prepared.columns if "_pitcher_" in c],
    )
    assert prepared_aligned.count() == 15

    # --- E1 phase 1: yesterday's outcomes arrive -> MERGE
    results = spark.read.parquet(f"{fixture_dir}/game_results.parquet")
    updated = update_games(base, results, teams)
    updated.write.mode("overwrite").parquet(games_path)
    stored = spark.read.parquet(games_path)
    assert stored.count() == base.count()

    # --- E2: feature build (drop -> dropna -> ratios -> diffs -> label)
    features = build_features(stored)
    feat_path = os.path.join(out_root, "features")
    features.write.mode("overwrite").parquet(feat_path)
    feats = spark.read.parquet(feat_path)
    assert feats.columns[-1] == "winning_team" and len(feats.columns) == 12

    # --- E3: train all families/models, pick + save best, reload, predict
    lb = train_leaderboard(spark, feats)
    best = select_best(lb)
    assert best.count() == 3
    fam_cols = {"all_stats"}
    from mlb_win_predictor_spark.ml.train import FEATURE_FAMILIES, save_best_models

    fitted = {}
    train, test = feats.withColumn(
        "label", F.col("winning_team").cast("double")
    ).randomSplit([0.8, 0.2], seed=42)
    for fam in fam_cols:
        m = make_pipeline(FEATURE_FAMILIES[fam], MODELS["logistic_regression"]()).fit(train)
        fitted[(fam, "logistic_regression")] = m
    lb1 = spark.createDataFrame(
        [
            {
                "family": "all_stats",
                "model": "logistic_regression",
                **evaluate_predictions(
                    fitted[("all_stats", "logistic_regression")].transform(test), "label"
                ),
                "n_train": train.count(),
                "n_test": test.count(),
            }
        ]
    )
    models_dir = os.path.join(out_root, "models")
    save_best_models(lb1, fitted, models_dir)
    from pyspark.ml import PipelineModel

    reloaded = PipelineModel.load(
        os.path.join(models_dir, "all_stats__logistic_regression")
    )
    scored = reloaded.transform(test)
    assert scored.select("prediction").distinct().count() <= 2
    acc = evaluate_predictions(scored, "label")["accuracy"]
    assert 0.3 <= acc <= 0.75
