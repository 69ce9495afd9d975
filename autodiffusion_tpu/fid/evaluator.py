"""FID evaluator: batched on-device activations -> reference-vs-sample FID.

Equivalent of evaluations/evaluator_v1.py:249-280 (compute_activations over
an in-memory uint8 NHWC array) and :730-753 (cal_fid), with the InceptionV3
pass jitted on device (sharded across the mesh by the search layer) instead
of a host TF1 session.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .inception import FIDInceptionV3, preprocess
from .stats import (FeatureStats, FIDStats, accumulate_stats, finalize_stats,
                    frechet_distance, inception_score)

__all__ = ["FIDEvaluator", "make_inception_feature_fn", "inception_apply"]


def make_inception_feature_fn(params: dict, *, resize_to: int = 299) -> Callable:
    """feature_fn(uint8 NHWC [B,H,W,3]) -> dict(pool3, spatial, logits).

    For TOP-LEVEL use (FIDEvaluator batch loops). Do NOT call the returned
    closure inside another jit: the bound params become trace-time
    constants there — pass :func:`inception_apply` + explicit params to
    BatchedFIDFitness instead (observed failure: host constant folding of
    the weight casts ballooned a search compile past 60 GB RSS)."""
    model = FIDInceptionV3()

    @jax.jit
    def feature_fn(images_uint8):
        return model.apply(params, preprocess(images_uint8, resize_to))

    return feature_fn


@functools.partial(jax.jit, static_argnames="resize_to")
def inception_apply(params: dict, images_uint8, resize_to: int = 299):
    """Pure two-argument Inception feature fn for use INSIDE other jitted
    programs (the fitness chunk): params stay jit ARGUMENTS, never closure
    constants (the repo-wide tunneled-TPU rule, search/fitness.py).

    Deliberately jitted: called under an outer trace this stays a nested
    pjit call, so XLA keeps InceptionV3 a separate sub-computation instead
    of inlining ~300 conv ops into the sampler scan + classifier-VJP
    program — the inlined form made the TPU compiler balloon past 45 GB
    host RSS without terminating (measured; the bounded-call form
    compiles the full search chunk in ~6 min)."""
    return FIDInceptionV3().apply(params, preprocess(images_uint8, resize_to))


class FIDEvaluator:
    """Computes FID (and optionally IS/sFID) of sample arrays against
    precomputed reference statistics.

    feature_fn: batched uint8 NHWC -> dict with at least "pool3"; any
    extractor works (the real InceptionV3, or a cheap stub in tests —
    the reference hard-wires TF InceptionV3, evaluator_v1.py:160-175).
    """

    def __init__(self, feature_fn: Callable, ref_stats: FIDStats,
                 ref_stats_spatial: Optional[FIDStats] = None,
                 batch_size: int = 100):
        self.feature_fn = feature_fn
        self.ref_stats = ref_stats
        self.ref_stats_spatial = ref_stats_spatial
        self.batch_size = batch_size

    def compute_activations(self, arr_uint8: np.ndarray,
                            want_softmax: bool = False,
                            want_spatial: bool = False):
        """[N,H,W,3] uint8 -> (pool3 [N,2048], softmax or None, spatial or
        None). spatial = flattened sFID features (first 7 channels of the
        17x17 grid, evaluator_v1.py:665-679)."""
        n = arr_uint8.shape[0]
        bs = self.batch_size
        pools, smx, spat = [], [], []
        for i in range(0, n, bs):
            batch = arr_uint8[i:i + bs]
            pad = 0
            if batch.shape[0] < bs:   # pad to keep one compiled shape
                pad = bs - batch.shape[0]
                batch = np.concatenate(
                    [batch, np.zeros((pad,) + batch.shape[1:], batch.dtype)])
            out = self.feature_fn(jnp.asarray(batch))

            def take(x):
                x = np.asarray(x)
                return x[:bs - pad] if pad else x

            pools.append(take(out["pool3"]))
            if want_softmax and "logits" in out:
                smx.append(take(jax.nn.softmax(out["logits"], axis=-1)))
            if want_spatial and "spatial" in out:
                s = out["spatial"]
                spat.append(take(s.reshape(s.shape[0], -1)))
        pool3 = np.concatenate(pools)
        return (pool3,
                np.concatenate(smx) if smx else None,
                np.concatenate(spat) if spat else None)

    def cal_fid(self, arr_uint8: np.ndarray) -> float:
        """FID of a uint8 NHWC sample array vs the reference stats
        (evaluator_v1.py:730-753)."""
        pool3, _, _ = self.compute_activations(arr_uint8)
        return frechet_distance(FIDStats.from_features(pool3), self.ref_stats)

    def cal_metrics(self, arr_uint8: np.ndarray,
                    ref_features: Optional[np.ndarray] = None) -> dict:
        """FID + IS (+ sFID when spatial ref stats given, + precision/recall
        when raw reference features given) — offline evaluator parity
        (evaluations/evaluator.py output, README.md:60-75)."""
        want_spatial = self.ref_stats_spatial is not None
        pool3, sm, spatial = self.compute_activations(
            arr_uint8, want_softmax=True, want_spatial=want_spatial)
        out = {
            "fid": frechet_distance(FIDStats.from_features(pool3), self.ref_stats),
        }
        if sm is not None:      # IS needs a 'logits' head; pool3-only
            out["inception_score"] = inception_score(sm)   # stubs skip it
        if want_spatial and spatial is not None:
            out["sfid"] = frechet_distance(FIDStats.from_features(spatial),
                                           self.ref_stats_spatial)
        if ref_features is not None:
            from .prd import precision_recall
            p, r = precision_recall(ref_features, pool3)
            out["precision"], out["recall"] = p, r
        return out

    @staticmethod
    def stats_from_images(feature_fn: Callable, arr_uint8: np.ndarray,
                          batch_size: int = 100) -> FIDStats:
        """Precompute reference statistics from a real-image array."""
        ev = FIDEvaluator(feature_fn, None, batch_size=batch_size)  # type: ignore
        pool3, _, _ = ev.compute_activations(arr_uint8)
        return FIDStats.from_features(pool3)
