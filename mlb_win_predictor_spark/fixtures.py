"""Deterministic reference-shaped fixtures (FIXTURES.md; seed 42).

Generates the ``games`` / ``players`` / ``teams`` / ``pitching_log`` /
``game_results`` tables that exercise the games-pipeline semantics
(reference src/function.py + modeling notebooks), as parquet under a
caller-supplied directory. Value ranges mirror the observed reference
data (modeling/eda.ipynb cell 7/18 outputs); null patterns reproduce the
2129→1693→1673-shaped dropna funnel.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import numpy as np
import pandas as pd

SEED = 42
N_GAMES = 2000
N_TEAMS = 30
N_PITCHERS = 120
N_LOG_APPEARANCES = 30

TEAM_NAMES = [f"Team {chr(65 + i // 26)}{chr(65 + i % 26)}" for i in range(N_TEAMS)]

STAT_COLS = [
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
]


def make_teams() -> pd.DataFrame:
    return pd.DataFrame(
        {"team_id": np.arange(108, 108 + N_TEAMS, dtype=np.int64), "team_name": TEAM_NAMES}
    )


def make_players(rng: np.random.Generator) -> pd.DataFrame:
    ids = np.arange(500000, 500000 + N_PITCHERS, dtype=np.int64)
    names = [f"Pitcher {i:03d}" for i in range(N_PITCHERS)]
    # two players share a name (first-match [0] tie-break, src/function.py:66)
    names[50] = names[49]
    throws = rng.choice(["L", "R"], size=N_PITCHERS, p=[0.3, 0.7])
    return pd.DataFrame({"player_id": ids, "player_name": names, "throws": throws})


def _stat_block(rng: np.random.Generator, n: int, prefix: str) -> dict[str, np.ndarray]:
    era = np.round(rng.uniform(0, 31, n), 2)
    wp = np.round(rng.uniform(0, 1, n), 3)
    wins = rng.integers(0, 21, n).astype(np.int64)
    losses = rng.integers(0, 21, n).astype(np.int64)
    ip = np.floor(rng.uniform(0, 200, n)) + rng.choice([0.0, 0.3, 0.6], n)
    k9 = np.round(rng.uniform(0, 18, n), 2)
    bb9 = np.round(rng.uniform(0, 17.55, n), 2)
    bb9[rng.random(n) < 0.03] = 0.0  # exact zeros exercise guarded division D1
    kbb = np.round(rng.uniform(-0.2, 0.44, n), 3)
    whip = np.round(rng.uniform(0, 4, n), 2)
    babip = np.round(rng.uniform(0, 0.78, n), 3)
    vals = [era, wp, wins, losses, ip, k9, bb9, kbb, whip, babip]
    return {f"{prefix}_pitcher_{c}": v for c, v in zip(STAT_COLS, vals)}


def make_games(rng: np.random.Generator, players: pd.DataFrame, teams: pd.DataFrame) -> pd.DataFrame:
    n = N_GAMES
    game_id = np.arange(716352, 716352 + n, dtype=np.int64)
    home_idx = rng.integers(0, N_TEAMS, n)
    away_off = rng.integers(1, N_TEAMS, n)
    away_idx = (home_idx + away_off) % N_TEAMS
    home_team_id = teams.team_id.values[home_idx]
    away_team_id = teams.team_id.values[away_idx]

    hp_idx = rng.integers(0, N_PITCHERS, n)
    ap_idx = rng.integers(0, N_PITCHERS, n)
    home_pitcher = players.player_name.values[hp_idx].astype(object)
    away_pitcher = players.player_name.values[ap_idx].astype(object)
    home_pitcher_id = players.player_id.values[hp_idx].astype("float64")
    away_pitcher_id = players.player_id.values[ap_idx].astype("float64")
    # some names absent from the dim -> id lookup fails (left-join null path)
    missing_h = rng.random(n) < 0.02
    missing_a = rng.random(n) < 0.02
    home_pitcher[missing_h] = "Unknown Starter"
    away_pitcher[missing_a] = "Unknown Starter"
    home_pitcher_id[missing_h] = np.nan
    away_pitcher_id[missing_a] = np.nan

    df = pd.DataFrame(
        {
            "game_id": game_id,
            "home_team_id": home_team_id,
            "home_team_name": teams.team_name.values[home_idx],
            "away_team_id": away_team_id,
            "away_team_name": teams.team_name.values[away_idx],
            "home_pitcher": home_pitcher,
            "home_pitcher_id": home_pitcher_id,
            "away_pitcher": away_pitcher,
            "away_pitcher_id": away_pitcher_id,
            **_stat_block(rng, n, "home"),
            **_stat_block(rng, n, "away"),
        }
    )
    # outcome: ~5% NULL (ties/postponed, src/function.py:485-494)
    home_wins = rng.random(n) < 0.525
    winning = np.where(home_wins, home_team_id, away_team_id).astype("float64")
    winning[rng.random(n) < 0.05] = np.nan
    df["winning_team"] = winning
    # predicted_winner ~37% NULL (eda cell 7: 786/2129)
    pred = np.where(rng.random(n) < 0.5, home_team_id, away_team_id).astype("float64")
    pred[rng.random(n) < 0.37] = np.nan
    df["predicted_winner"] = pred
    # ~6.5% of rows: full pitcher-stat block NULL (game prepared, pitcher
    # unknown — 138/2129 observed) => dropna funnel shape
    block_null = rng.random(n) < 0.065
    stat_cols = [f"{s}_pitcher_{c}" for s in ("home", "away") for c in STAT_COLS]
    df.loc[block_null, stat_cols] = np.nan
    return df


def make_pitching_log(rng: np.random.Generator, players: pd.DataFrame) -> pd.DataFrame:
    rows = []
    base = pd.Timestamp("2023-04-01")
    gid = 900000
    for pid in players.player_id.values[:100]:
        n_app = N_LOG_APPEARANCES
        dates = base + pd.to_timedelta(np.sort(rng.choice(180, n_app, replace=False)), unit="D")
        for d in dates:
            bf = int(rng.integers(3, 40))
            ab = max(bf - int(rng.integers(0, 8)), 1)
            so = int(rng.integers(0, min(ab, 15) + 1))
            h = int(rng.integers(0, min(ab, 20) + 1))
            hr = int(rng.integers(0, min(h, 3) + 1))
            rows.append(
                {
                    "pitcher_id": int(pid),
                    "game_id": gid,
                    "game_date": d.date(),
                    "outs_recorded": int(rng.integers(0, 28)),
                    "hits": h,
                    "walks": int(rng.integers(0, 8)),
                    "strikeouts": so,
                    "earned_runs": int(rng.integers(0, 10)),
                    "home_runs": hr,
                    "batters_faced": bf,
                    "at_bats": ab,
                    "sac_flies": int(rng.integers(0, 3)),
                    "won": int(rng.random() < 0.3),
                    "lost": int(rng.random() < 0.3),
                }
            )
            gid += 1
    return pd.DataFrame(rows)


def make_game_results(rng: np.random.Generator, games: pd.DataFrame, teams: pd.DataFrame) -> pd.DataFrame:
    id_to_name = dict(zip(teams.team_id.values, teams.team_name.values))
    sub = games.sample(n=600, random_state=SEED)[["game_id", "home_team_id"]]
    res = pd.DataFrame(
        {
            "game_id": sub.game_id.values,
            "winning_team_name": [id_to_name[t] for t in sub.home_team_id.values],
            "result_date": pd.Timestamp("2023-08-26").date(),
        }
    )
    # unmatched ids (anti-join path) + exact duplicates (rescheduled dedup)
    extra = pd.DataFrame(
        {
            "game_id": np.array([999001, 999002], dtype=np.int64),
            "winning_team_name": [TEAM_NAMES[0], TEAM_NAMES[1]],
            "result_date": pd.Timestamp("2023-08-26").date(),
        }
    )
    dups = res.head(5)
    return pd.concat([res, extra, dups], ignore_index=True)


def _generator_fingerprint() -> str:
    """Content hash of THIS module's source PLUS the numpy/pandas
    versions — folded into the shared cache-directory name so any change
    to the fixture generators (schema, new table, distribution tweak) OR
    to the libraries whose RNG/date semantics the generators depend on
    invalidates the cross-process cache instead of silently serving
    stale parquet built by an older version (ADVICE r7/r8; all generator
    logic lives in this one module, so its source + the library versions
    are the complete input set). Falls back to the versions alone if the
    source file is unreadable (zipapp installs)."""
    import hashlib

    h = hashlib.md5(f"np={np.__version__};pd={pd.__version__};".encode())
    try:
        with open(__file__, "rb") as fh:
            h.update(fh.read())
    except OSError:
        h.update(b"nosrc")
    return h.hexdigest()[:12]


def fixtures_dir(base: str | None = None) -> str:
    """The fixture tables as a CACHED on-disk dataset, shared across
    processes: the content is a pure function of seed 42 AND this
    module's source (hashed into the directory name, so regenerated
    logic never trusts a stale cache). Build-then-atomic-rename (with a
    _SUCCESS marker) makes a racing second builder harmless — the
    loser's temp dir is discarded."""
    d = base or os.path.join(
        tempfile.gettempdir(), f"mlb_wp_fixtures_seed42_{_generator_fingerprint()}"
    )
    if os.path.exists(os.path.join(d, "_SUCCESS")):
        return d
    if base is None:
        # best-effort sweep of superseded sibling caches (older
        # fingerprints) so tempdir doesn't accumulate stale copies —
        # failures (e.g. another process still reading one) are harmless
        import glob

        for stale in glob.glob(
            os.path.join(tempfile.gettempdir(), "mlb_wp_fixtures_seed42_*")
        ):
            if stale != d:
                shutil.rmtree(stale, ignore_errors=True)
    tmp = f"{d}.build-{os.getpid()}"
    write_fixtures(tmp)
    with open(os.path.join(tmp, "_SUCCESS"), "w") as fh:
        fh.write("seed=42")
    try:
        os.rename(tmp, d)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)
    return d


def write_fixtures(out_dir: str) -> dict[str, str]:
    """Generate all fixtures under out_dir; returns table -> path."""
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(SEED)
    teams = make_teams()
    players = make_players(rng)
    games = make_games(rng, players, teams)
    plog = make_pitching_log(rng, players)
    results = make_game_results(rng, games, teams)
    paths = {}
    for name, df in (
        ("teams", teams),
        ("players", players),
        ("games", games),
        ("pitching_log", plog),
        ("game_results", results),
    ):
        p = os.path.join(out_dir, f"{name}.parquet")
        df.to_parquet(p, index=False)
        paths[name] = p
    return paths
