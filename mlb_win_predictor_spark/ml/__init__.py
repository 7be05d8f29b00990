from .nearest_centroid import NearestCentroidModel, fit_nearest_centroid
from .knn import knn_predict_lsh
from .rff import fit_rbf_svc, rff_transform
from .train import (
    FEATURE_FAMILIES,
    evaluate_predictions,
    make_pipeline,
    select_best,
    train_leaderboard,
)

__all__ = [
    "fit_rbf_svc",
    "rff_transform",
    "FEATURE_FAMILIES",
    "NearestCentroidModel",
    "evaluate_predictions",
    "fit_nearest_centroid",
    "knn_predict_lsh",
    "make_pipeline",
    "select_best",
    "train_leaderboard",
]
