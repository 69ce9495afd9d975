"""On-device FID fitness: InceptionV3 features, moments, Frechet distance."""

from .evaluator import FIDEvaluator, make_inception_feature_fn
from .inception import FIDInceptionV3, load_fid_inception_params, preprocess
from .prd import manifold_radii, pairwise_sq_distances, precision_recall
from .stats import (FeatureStats, FIDStats, accumulate_stats, finalize_stats,
                    frechet_distance, inception_score)

__all__ = [
    "FIDEvaluator", "make_inception_feature_fn", "FIDInceptionV3",
    "load_fid_inception_params", "preprocess", "FeatureStats", "FIDStats",
    "accumulate_stats", "finalize_stats", "frechet_distance", "inception_score",
    "manifold_radii", "pairwise_sq_distances", "precision_recall",
]
