"""Games-pipeline replica (SURVEY.md §3 E1/E2) as lazy DataFrame chains.

The reference runs these as imperative per-row loops crossing a network
boundary per arrow (src/function.py:652-687) and a driver-RAM polars
notebook (modeling/eda.ipynb). Here each is a single Catalyst plan:

- ``update_games``  : E1 phase 1 — late outcomes MERGEd onto stored games
  (src/function.py:462-539)
- ``prepare_games`` : E1 phase 2 — schedule enriched with dim lookups +
  as-of pitcher stats, deduped, appended (src/function.py:542-649)
- ``build_features``: E2 — drop cols -> dropna -> guarded ratios ->
  differential features + label (modeling/eda.ipynb cells 12-31)
- ``asof_pitcher_stats``: J4 — season-to-date stats *going into* each
  appearance, the capability the reference could not have (README.md:26-28)

At 100 TB: games/pitching_log are date-partitioned facts; teams/players
broadcast; the only shuffles are the merge join on game_id and the as-of
window hash on pitcher_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..functions import scalars as S

DROP_COLS = [
    "home_team_name",
    "away_team_name",
    "home_pitcher",
    "away_pitcher",
    "home_pitcher_id",
    "away_pitcher_id",
    "predicted_winner",
]

DIFF_FEATURES = [
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

FEATURE_COLS = [f"pitcher_{c}_comp" for c in DIFF_FEATURES]
LABEL_COL = "winning_team"


def update_games(games: DataFrame, results: DataFrame, teams: DataFrame) -> DataFrame:
    """E1/J3 — MERGE late outcomes into games (src/function.py:480-513).

    results carries team *names* (the reference resolves via HTTP
    lookup_team, :486); we resolve via a broadcast dim join, dedup exact
    re-sends (rescheduled games, :624-636), and left-join-merge: matched
    rows get winning_team set, unmatched result rows are dropped (the
    reference logs them), unmatched game rows pass through.
    """
    r = results.dropDuplicates(["game_id"])
    r = (
        r.join(F.broadcast(teams), r.winning_team_name == teams.team_name, "left")
        .select("game_id", F.col("team_id").alias("new_winning_team"))
    )
    merged = games.join(r, "game_id", "left")
    return merged.withColumn(
        "winning_team",
        F.coalesce(F.col("new_winning_team"), F.col("winning_team")),
    ).drop("new_winning_team")


def asof_pitcher_stats(pitching_log: DataFrame) -> DataFrame:
    """J4 — cumulative season-to-date stats as of (i.e. strictly before)
    each appearance: the 'stats going into the game' invariant
    (README.md:26-28). Frame excludes the current row.

    Derived stats reuse the reference formulas: ERA = 9*ER/IP with
    IP = outs/3 (base-3 decode dual of src/function.py:186-192), K%-BB%
    (src/function.py:269-276), BABIP (src/function.py:335-337), WHIP,
    win% — all as native expressions over the cumulative sums.
    """
    w = (
        W.partitionBy("pitcher_id")
        .orderBy(F.col("game_date").asc(), F.col("game_id").asc())
        .rowsBetween(W.unboundedPreceding, -1)
    )

    def cum(c: str):
        return F.sum(F.col(c).cast("double")).over(w)

    ip = cum("outs_recorded") / 3.0
    so, bb, h, hr, ab, sf, er, bf = (
        cum("strikeouts"),
        cum("walks"),
        cum("hits"),
        cum("home_runs"),
        cum("at_bats"),
        cum("sac_flies"),
        cum("earned_runs"),
        cum("batters_faced"),
    )
    wins, losses = cum("won"), cum("lost")
    return pitching_log.select(
        "pitcher_id",
        "game_id",
        "game_date",
        F.count(F.lit(1)).over(w).alias("prior_appearances"),
        S.stable_round(S.guarded_div(F.lit(9.0) * er, ip), 2).alias("era"),
        S.stable_round(S.guarded_div(wins, wins + losses), 3).alias("win_percentage"),
        wins.alias("wins"),
        losses.alias("losses"),
        S.stable_round(ip, 6).alias("innings_pitched"),
        S.stable_round(S.guarded_div(F.lit(9.0) * so, ip), 6).alias("k_nine"),
        S.stable_round(S.guarded_div(F.lit(9.0) * bb, ip), 6).alias("bb_nine"),
        S.stable_round(S.guarded_div(so, bf) - S.guarded_div(bb, bf), 6).alias("k_bb_diff"),
        S.stable_round(S.guarded_div(h + bb, ip), 6).alias("whip"),
        S.stable_round(S.guarded_div(h - hr, ab - so - hr + sf), 6).alias("babip"),
    )


def prepare_games(
    schedule: DataFrame, players: DataFrame, stats_asof: DataFrame, stat_date
) -> DataFrame:
    """E1 phase 2 — enrich today's schedule (src/function.py:542-649).

    The reference fires ~21 HTTP calls per game (lookup_player ×11 +
    player_stat_data ×10, :574-603); here each side resolves with ONE
    broadcast dim join + ONE as-of join against the cumulative stats
    fact — the Catalyst-level common-subexpression fix (SURVEY §4.2).
    First-match ``[0]`` tie-break = row_number()==1 on player_id.
    """
    wdup = W.partitionBy("player_name").orderBy(F.col("player_id").asc())
    p1 = (
        players.withColumn("rn", F.row_number().over(wdup))
        .filter(F.col("rn") == 1)
        .select("player_name", "player_id")
    )
    latest = stats_asof.filter(F.col("game_date") <= F.lit(stat_date))
    wlast = W.partitionBy("pitcher_id").orderBy(
        F.col("game_date").desc(), F.col("game_id").desc()
    )
    latest = (
        latest.withColumn("rn", F.row_number().over(wlast))
        .filter(F.col("rn") == 1)
        .drop("rn", "game_id", "game_date", "prior_appearances")
    )

    out = schedule.dropDuplicates(["game_id"])
    for side in ("home", "away"):
        dim = F.broadcast(p1).alias(f"p_{side}")
        out = out.join(
            dim, out[f"{side}_pitcher"] == F.col(f"p_{side}.player_name"), "left"
        ).withColumn(f"{side}_pitcher_id", F.col(f"p_{side}.player_id")).drop(
            F.col(f"p_{side}.player_name")
        ).drop(F.col(f"p_{side}.player_id"))
        st = F.broadcast(latest).alias(f"s_{side}")
        out = out.join(
            st, out[f"{side}_pitcher_id"] == F.col(f"s_{side}.pitcher_id"), "left"
        )
        for c in DIFF_FEATURES[:-1]:  # k_bb_ratio derived later in E2
            out = out.withColumn(f"{side}_pitcher_{c}", F.col(f"s_{side}.{c}"))
        out = out.drop(F.col(f"s_{side}.pitcher_id")).drop(
            *[F.col(f"s_{side}.{c}") for c in DIFF_FEATURES[:-1]]
        )
    return out


def prediction_features(games: DataFrame) -> DataFrame:
    """E2 feature build for INFERENCE — the label-free, key-preserving
    twin of ``build_features`` (same drop → dropna → guarded-ratio →
    dropna funnel, same 11 differential features), used by the 2024+
    production phase that scores *upcoming* games (README.md:24): those
    rows have no ``winning_team`` yet, so the funnel must not require
    one, and the keys (game_id, team ids) must survive so predictions
    can MERGE back. For rows that DO carry a label the two funnels keep
    exactly the same set (pytest-pinned funnel parity)."""
    keys = [c for c in ("game_id", "home_team_id", "away_team_id") if c in games.columns]
    df = games.drop(*[c for c in DROP_COLS if c in games.columns])
    if "winning_team" in df.columns:
        df = df.drop("winning_team")
    df = df.na.drop("any")
    for side in ("home", "away"):
        df = df.withColumn(
            f"{side}_pitcher_k_bb_ratio",
            S.guarded_div(F.col(f"{side}_pitcher_k_nine"), F.col(f"{side}_pitcher_bb_nine")),
        )
    df = df.na.drop("any")
    diffs = [
        (F.col(f"away_pitcher_{c}") - F.col(f"home_pitcher_{c}")).alias(f"pitcher_{c}_comp")
        for c in DIFF_FEATURES
    ]
    return df.select(*keys, *diffs)


def score_games(games: DataFrame, model) -> DataFrame:
    """E1 2024+ production phase — score the slate with the selected model
    and MERGE ``predicted_winner`` back (reference README.md:24: "Use the
    aforementioned models to try to predict outcomes… show the results
    live"; the ``predicted_winner`` column of modeling/eda.ipynb cell 7).

    ``model`` is a fitted PipelineModel or a saved-model directory (the
    output of ``ml.train.save_best_models``) — the load-and-serve half of
    the train/save/reload loop. Scoring is one broadcast-model map pass
    over the rows that clear the feature funnel; prediction==1.0 means
    home win (``functions.scalars.home_win_label``), so the published
    winner is home_team_id, else away_team_id. MERGE semantics match
    ``update_games``: matched rows take the fresh prediction, unmatched
    rows (games the funnel rejected — unknown pitcher, missing stats)
    keep whatever prediction they had; nothing is dropped or appended.

    Scale shape: the fitted model is a task-closure broadcast; the only
    wide dependency is the merge join on game_id (and at 100 TB both
    sides are the same date-partitioned fact, so it co-partitions)."""
    from pyspark.ml import PipelineModel

    if isinstance(model, str):
        model = PipelineModel.load(model)
    feats = prediction_features(games)
    pred = model.transform(feats)
    ptype = dict(games.dtypes).get("predicted_winner", "double")
    winner = (
        F.when(F.col("prediction") == 1.0, F.col("home_team_id"))
        .otherwise(F.col("away_team_id"))
        .cast(ptype)
    )
    preds = pred.select("game_id", winner.alias("_fresh_prediction"))
    merged = games.join(preds, "game_id", "left")
    old = (
        F.col("predicted_winner")
        if "predicted_winner" in games.columns
        else F.lit(None).cast(ptype)
    )
    return merged.withColumn(
        "predicted_winner", F.coalesce(F.col("_fresh_prediction"), old)
    ).drop("_fresh_prediction")


def build_features(games: DataFrame) -> DataFrame:
    """E2 — the eda.ipynb feature build as one lazy chain
    (modeling/eda.ipynb cells 12→31):

    drop 7 cols → dropna(any) → guarded k_bb_ratio ×2 → dropna →
    11 away−home differential features + binary home-win label.

    Catalyst collapses this to a single whole-stage-codegen'd
    scan-project-filter — no intermediate materialization (the reference
    materializes at every cell and de-vectorizes in a Python row loop,
    eda cell 27).
    """
    df = games.drop(*[c for c in DROP_COLS if c in games.columns])
    df = df.na.drop("any")
    for side in ("home", "away"):
        df = df.withColumn(
            f"{side}_pitcher_k_bb_ratio",
            S.guarded_div(F.col(f"{side}_pitcher_k_nine"), F.col(f"{side}_pitcher_bb_nine")),
        )
    df = df.na.drop("any")
    label = S.home_win_label(F.col("winning_team"), F.col("home_team_id"))
    diffs = [
        (F.col(f"away_pitcher_{c}") - F.col(f"home_pitcher_{c}")).alias(f"pitcher_{c}_comp")
        for c in DIFF_FEATURES
    ]
    return df.select(*diffs, label.alias(LABEL_COL))
