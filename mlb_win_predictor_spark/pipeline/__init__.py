from .games import (
    asof_pitcher_stats,
    build_features,
    prediction_features,
    prepare_games,
    score_games,
    update_games,
)

__all__ = [
    "asof_pitcher_stats",
    "build_features",
    "prediction_features",
    "prepare_games",
    "score_games",
    "update_games",
]
