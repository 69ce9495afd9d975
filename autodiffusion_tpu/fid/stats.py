"""FID statistics: on-device moments, host Frechet distance, Inception Score.

Equivalent of evaluations/evaluator_v1.py:86-157 (FIDStatistics.
frechet_distance with the eps-jitter and imaginary-clamp quirks) and :223-236
(Inception Score), with the feature moments accumulated on device in float64-
free form: mean and covariance via batched sums (the arrays are [N, 2048],
small next to the model compute).
"""

from __future__ import annotations

import warnings
from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

__all__ = ["FeatureStats", "FIDStats", "accumulate_stats", "finalize_stats",
           "frechet_distance", "frechet_distance_eigh", "inception_score"]


class FeatureStats(NamedTuple):
    """Running sums for mean/cov of a feature stream (device-resident)."""

    n: jnp.ndarray          # scalar count
    s1: jnp.ndarray         # [D] sum of features
    s2: jnp.ndarray         # [D, D] sum of outer products

    @classmethod
    def zeros(cls, dim: int, dtype=jnp.float32) -> "FeatureStats":
        return cls(jnp.zeros((), dtype), jnp.zeros((dim,), dtype),
                   jnp.zeros((dim, dim), dtype))


class FIDStats(NamedTuple):
    """Finalized reference statistics (host numpy)."""

    mu: np.ndarray          # [D]
    sigma: np.ndarray       # [D, D]

    @classmethod
    def from_features(cls, feats: np.ndarray) -> "FIDStats":
        feats = np.asarray(feats, dtype=np.float64)
        return cls(feats.mean(axis=0), np.cov(feats, rowvar=False))

    def save(self, path: str) -> None:
        np.savez(path, mu=self.mu, sigma=self.sigma)

    @classmethod
    def load(cls, path: str) -> "FIDStats":
        with np.load(path) as z:
            return cls(np.asarray(z["mu"]), np.asarray(z["sigma"]))


def accumulate_stats(stats: FeatureStats, feats: jnp.ndarray,
                     shift: Optional[jnp.ndarray] = None) -> FeatureStats:
    """Add a [B, D] batch of features (jit/psum friendly).

    ``shift`` (a [D] vector, typically the reference mu) is subtracted before
    accumulating: moments of centered features avoid the f32 cancellation of
    s2 - n*mu*mu^T when streaming tens of thousands of samples — the
    device-friendly equivalent of the reference's float64 np.cov
    (evaluator_v1.py compute_statistics). Pass the SAME shift to
    finalize_stats.
    """
    import jax

    f32 = feats.astype(stats.s1.dtype)
    if shift is not None:
        f32 = f32 - shift.astype(f32.dtype)
    # The outer-product sum MUST run at full f32 precision: on TPU the
    # default f32 matmul uses reduced-precision bf16 passes, and a ~1e-2
    # relative error on s2 propagates through sqrt(eig(.)) into multi-unit
    # FID bias (measured: negative FIDs at n=512 in the round-4 method
    # proof). The dot is [D,B]x[B,D] — trivial FLOPs next to the model.
    return FeatureStats(
        n=stats.n + feats.shape[0],
        s1=stats.s1 + f32.sum(axis=0),
        s2=stats.s2 + jnp.matmul(f32.T, f32,
                                 precision=jax.lax.Precision.HIGHEST),
    )


def finalize_stats(stats: FeatureStats,
                   shift: Optional[np.ndarray] = None) -> FIDStats:
    """Sums -> (mu, unbiased covariance), matching np.cov's N-1 denominator.

    Covariance is shift-invariant; the mean adds the shift back.
    """
    n = float(np.asarray(stats.n))
    s1 = np.asarray(stats.s1, dtype=np.float64)
    s2 = np.asarray(stats.s2, dtype=np.float64)
    mu = s1 / n
    sigma = (s2 - n * np.outer(mu, mu)) / (n - 1)
    if shift is not None:
        mu = mu + np.asarray(shift, dtype=np.float64)
    return FIDStats(mu, sigma)


def frechet_distance(s1: FIDStats, s2: FIDStats, eps: float = 1e-6) -> float:
    """||mu1-mu2||^2 + Tr(S1 + S2 - 2 sqrt(S1 S2)).

    Host scipy implementation with the reference's numerical guards
    (evaluator_v1.py:109-157): jitter the diagonal when sqrtm produces
    non-finite values; clamp small imaginary components.
    """
    import scipy.linalg

    def _sqrtm(a):
        out = scipy.linalg.sqrtm(a)
        return out[0] if isinstance(out, tuple) else out  # scipy<1.18 compat

    mu1, sigma1 = s1.mu, s1.sigma
    mu2, sigma2 = s2.mu, s2.sigma
    assert mu1.shape == mu2.shape and sigma1.shape == sigma2.shape

    diff = mu1 - mu2
    covmean = _sqrtm(sigma1.dot(sigma2))
    if not np.isfinite(covmean).all():
        warnings.warn(f"fid calculation produces singular product; adding {eps} "
                      "to diagonal of cov estimates")
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = _sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
            m = np.max(np.abs(covmean.imag))
            raise ValueError(f"Imaginary component {m}")
        covmean = covmean.real
    return float(diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2)
                 - 2 * np.trace(covmean))


def frechet_distance_eigh(s1: FIDStats, s2: FIDStats) -> float:
    """Frechet distance via two symmetric eigendecompositions.

    tr sqrt(S1 S2) = sum sqrt(eig(S1 S2)) and, for PSD S1,
    eig(S1 S2) = eig(sqrt(S1) S2 sqrt(S1)) — a symmetric PSD problem, so two
    eigh calls replace the reference's dense Schur sqrtm
    (evaluator_v1.py:109-157), which dominates per-candidate host time
    during search (~10x faster at D=2048, same value to ~1e-6 relative).
    """
    mu1, sigma1 = s1.mu, s1.sigma
    mu2, sigma2 = s2.mu, s2.sigma
    diff = mu1 - mu2
    w, v = np.linalg.eigh(sigma1)
    sqrt_s1 = (v * np.sqrt(np.maximum(w, 0.0))) @ v.T
    inner = sqrt_s1 @ sigma2 @ sqrt_s1
    ev = np.linalg.eigvalsh((inner + inner.T) / 2.0)
    tr_sqrt = np.sqrt(np.maximum(ev, 0.0)).sum()
    return float(diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2)
                 - 2.0 * tr_sqrt)


def make_device_frechet(ref_stats: FIDStats):
    """On-device Frechet distance from SHIFT-CENTERED FeatureStats sums.

    The host eigh path costs ~20 s per candidate at D=2048 (two 2048^2
    eigendecompositions plus a 17 MB moment-matrix transfer per candidate —
    ruinous through a tunneled TPU). Here sqrt(sigma_ref) is precomputed
    ONCE on host in float64, and each candidate needs a single on-device
    f32 eigvalsh of sqrt_ref @ sigma @ sqrt_ref; only the [C] scalars come
    back to host. Requires the stats to have been accumulated with
    shift=ref_stats.mu (see accumulate_stats), so mu - mu_ref == s1/n.

    Returns fn(stats: FeatureStats with [C, ...] leading axes) -> [C] FIDs.
    """
    import jax

    w, v = np.linalg.eigh(np.asarray(ref_stats.sigma, np.float64))
    sqrt_ref_host = (v * np.sqrt(np.maximum(w, 0.0))) @ v.T
    # sqrt_ref MUST be a jit ARGUMENT, not a closure capture: a closed-over
    # [2048, 2048] dense array becomes a 16 MB trace-time constant, and XLA's
    # constant handling of dense random data was measured to balloon this
    # program's compile to ~18 min / tens of GB host RSS on a full-scale
    # search (an np.eye ref folds trivially, which hid this in the bench).
    sqrt_ref = jax.device_put(np.asarray(sqrt_ref_host, np.float32))
    tr_ref = float(np.trace(ref_stats.sigma))

    def one(sq, n, s1, s2):
        # Full f32 precision throughout: TPU's default f32 matmul runs
        # reduced-precision bf16 passes (in these dots AND inside
        # eigvalsh's iterations), which biased tr_sqrt upward enough to
        # drive small-n FIDs negative (round-4 method proof, n=512).
        with jax.default_matmul_precision("highest"):
            mu_delta = s1 / n                   # == mu - mu_ref (centered)
            sigma = (s2 - n * jnp.outer(mu_delta, mu_delta)) / (n - 1.0)
            inner = sq @ sigma @ sq
            ev = jnp.linalg.eigvalsh((inner + inner.T) / 2.0)
            # Exact rank truncation: sigma from n mean-subtracted samples
            # has rank <= n-1, so eig(sqrt_ref sigma sqrt_ref) has at most
            # n-1 nonzeros; below that is eigh noise whose sqrt otherwise
            # accumulates across ~D-n eigenvalues into the FID.
            d = ev.shape[-1]
            keep = jnp.arange(d, dtype=jnp.float32) >= (d - (n - 1.0))
            tr_sqrt = jnp.sqrt(jnp.maximum(jnp.where(keep, ev, 0.0),
                                           0.0)).sum()
            return (mu_delta @ mu_delta + jnp.trace(sigma) + tr_ref
                    - 2.0 * tr_sqrt)

    batched = jax.jit(jax.vmap(one, in_axes=(None, 0, 0, 0)))

    def fn(stats: FeatureStats) -> np.ndarray:
        return np.asarray(batched(sqrt_ref, stats.n, stats.s1, stats.s2))

    return fn


def inception_score(softmax_probs: np.ndarray, split_size: int = 5000) -> float:
    """exp(E KL(p(y|x) || p(y))) over splits (evaluator_v1.py:223-236)."""
    preds = np.asarray(softmax_probs, dtype=np.float64)
    scores = []
    for i in range(0, len(preds), split_size):
        part = preds[i:i + split_size]
        kl = part * (np.log(part + 1e-12) - np.log(part.mean(axis=0, keepdims=True) + 1e-12))
        scores.append(np.exp(kl.sum(axis=1).mean()))
    return float(np.mean(scores))
