"""Improved precision & recall via manifold estimation.

Re-design of evaluations/evaluator_v1.py:282-507 (ManifoldEstimator /
DistanceBlock): per-feature manifold radii = distance to the k-th nearest
neighbor within the same set (k=3), precision = fraction of generated
features inside any reference sphere, recall = the reverse. Pairwise
distances run blocked on device in float32 (the reference uses a TF fp16
path with fp32 fallback; bf16/f32 on TPU needs no fallback).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["pairwise_sq_distances", "manifold_radii", "precision_recall"]


@jax.jit
def pairwise_sq_distances(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """[N,D],[M,D] -> [N,M] squared L2 distances."""
    a2 = jnp.sum(a ** 2, axis=1, keepdims=True)
    b2 = jnp.sum(b ** 2, axis=1, keepdims=True)
    d = a2 + b2.T - 2.0 * (a @ b.T)
    return jnp.maximum(d, 0.0)


def manifold_radii(feats: np.ndarray, nhood_size: int = 3,
                   block: int = 2048) -> np.ndarray:
    """Distance^2 to the nhood_size-th nearest neighbor (excluding self)."""
    n = feats.shape[0]
    fa = jnp.asarray(feats, jnp.float32)
    out = np.empty(n, np.float32)
    for i in range(0, n, block):
        d = np.asarray(pairwise_sq_distances(fa[i:i + block], fa))
        # k-th NN excluding self: self-distance is 0 -> take (k+1)-th smallest
        part = np.partition(d, nhood_size, axis=1)[:, nhood_size]
        out[i:i + block] = part
    return out


def _fraction_covered(probes: np.ndarray, refs: np.ndarray,
                      ref_radii: np.ndarray, block: int = 2048) -> float:
    pa = jnp.asarray(probes, jnp.float32)
    ra = jnp.asarray(refs, jnp.float32)
    rr = jnp.asarray(ref_radii, jnp.float32)
    covered = 0
    for i in range(0, probes.shape[0], block):
        d = pairwise_sq_distances(pa[i:i + block], ra)
        covered += int(jnp.sum(jnp.any(d <= rr[None, :], axis=1)))
    return covered / probes.shape[0]


def precision_recall(ref_feats: np.ndarray, sample_feats: np.ndarray,
                     nhood_size: int = 3) -> Tuple[float, float]:
    """(precision, recall) as in evaluator_v1.py:414-461."""
    ref_radii = manifold_radii(ref_feats, nhood_size)
    sample_radii = manifold_radii(sample_feats, nhood_size)
    precision = _fraction_covered(sample_feats, ref_feats, ref_radii)
    recall = _fraction_covered(ref_feats, sample_feats, sample_radii)
    return precision, recall
