"""ScheduleTables: a diffusion schedule as an immutable pytree of arrays.

The reference keeps schedule state as ~14 numpy attributes on a mutable
GaussianDiffusion object, recomputed in place per search candidate
(guided_diffusion/gaussian_diffusion.py:118-169;
search_imagenet64_classifier_guidance.py:200-255 reset_diffusion). Here the
same quantities are a frozen dataclass pytree of [K]-length arrays, so that

  * a new candidate is just new table *contents* — the jitted sampler is
    compiled once per (K, model) and reused for every candidate;
  * tables can be stacked and vmapped to evaluate many candidates at once;
  * everything is derived in float64 on host (matching the reference's numpy
    math) and cast to float32 only at the device boundary.
"""

from __future__ import annotations

from typing import Iterable, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from .beta import make_beta_schedule
from .respace import respaced_betas, space_timesteps

__all__ = ["ScheduleTables", "build_tables", "build_base_tables",
           "build_sd_tables", "stack_tables"]


@struct.dataclass
class ScheduleTables:
    """Per-step diffusion coefficients for a K-step (possibly respaced) process.

    All float fields have shape [K] (or [num_candidates, K] after
    :func:`stack_tables`). ``timestep_map[i]`` is the *original* timestep fed
    to the model at respaced step i (ascending), mirroring
    respace.py:115-127 (_WrappedModel).
    """

    timestep_map: jnp.ndarray          # int32 [K] original timesteps, ascending
    betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    alphas_cumprod_next: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    log_one_minus_alphas_cumprod: jnp.ndarray
    sqrt_recip_alphas_cumprod: jnp.ndarray
    sqrt_recipm1_alphas_cumprod: jnp.ndarray
    posterior_variance: jnp.ndarray
    posterior_log_variance_clipped: jnp.ndarray
    posterior_mean_coef1: jnp.ndarray
    posterior_mean_coef2: jnp.ndarray
    # Continuous-time view used by DPM-Solver: t in (0, 1], aligned with
    # timestep_map via t = (step + 1) / T_base.
    continuous_times: jnp.ndarray      # float32 [K]

    @property
    def num_steps(self) -> int:
        return self.betas.shape[-1]

    def gather(self, field: str, i) -> jnp.ndarray:
        return getattr(self, field)[..., i]


def _derive(betas: np.ndarray) -> dict:
    """All derived coefficient arrays from betas, float64 numpy.

    Formula-for-formula the quantities of gaussian_diffusion.py:118-169.
    """
    betas = np.asarray(betas, dtype=np.float64)
    if betas.ndim != 1:
        raise ValueError("betas must be 1-D")
    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas)
    alphas_cumprod_prev = np.append(1.0, alphas_cumprod[:-1])
    alphas_cumprod_next = np.append(alphas_cumprod[1:], 0.0)

    posterior_variance = betas * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod)
    # log-variance clipped at step 0 because posterior_variance[0] == 0.
    if len(betas) > 1:
        plvc = np.log(np.append(posterior_variance[1], posterior_variance[1:]))
    else:
        plvc = np.log(np.maximum(posterior_variance, 1e-20))
    return dict(
        betas=betas,
        alphas_cumprod=alphas_cumprod,
        alphas_cumprod_prev=alphas_cumprod_prev,
        alphas_cumprod_next=alphas_cumprod_next,
        sqrt_alphas_cumprod=np.sqrt(alphas_cumprod),
        sqrt_one_minus_alphas_cumprod=np.sqrt(1.0 - alphas_cumprod),
        log_one_minus_alphas_cumprod=np.log(1.0 - alphas_cumprod),
        sqrt_recip_alphas_cumprod=np.sqrt(1.0 / alphas_cumprod),
        sqrt_recipm1_alphas_cumprod=np.sqrt(1.0 / alphas_cumprod - 1.0),
        posterior_variance=posterior_variance,
        posterior_log_variance_clipped=plvc,
        posterior_mean_coef1=betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod),
        posterior_mean_coef2=(1.0 - alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - alphas_cumprod),
    )


def build_base_tables(schedule: str = "linear", num_steps: int = 1000,
                      dtype=jnp.float32, **schedule_kwargs) -> ScheduleTables:
    """Tables for the full (unrespaced) T-step process."""
    betas = make_beta_schedule(schedule, num_steps, **schedule_kwargs)
    return _to_tables(betas, list(range(num_steps)), num_steps, dtype)


def build_tables(use_timesteps: Union[str, Iterable[int]],
                 *,
                 base_schedule: str = "linear",
                 base_num_steps: int = 1000,
                 base_betas: Optional[np.ndarray] = None,
                 dtype=jnp.float32,
                 **schedule_kwargs) -> ScheduleTables:
    """Tables for a respaced process over a subset of original timesteps.

    ``use_timesteps`` is a candidate: an iterable of original step indices
    (any order; deduplicated and sorted), or a string accepted by
    :func:`space_timesteps` (e.g. ``"ddim4"``).
    """
    if base_betas is None:
        base_betas = make_beta_schedule(base_schedule, base_num_steps, **schedule_kwargs)
    base_betas = np.asarray(base_betas, dtype=np.float64)
    T = len(base_betas)
    if isinstance(use_timesteps, str):
        use_timesteps = space_timesteps(T, use_timesteps)
    base_abar = np.cumprod(1.0 - base_betas)
    new_betas, timestep_map = respaced_betas(base_abar, use_timesteps)
    return _to_tables(new_betas, timestep_map, T, dtype)


def _to_tables(betas: np.ndarray, timestep_map: Sequence[int], base_T: int,
               dtype) -> ScheduleTables:
    d = _derive(np.asarray(betas, dtype=np.float64))
    tmap = np.asarray(timestep_map, dtype=np.int32)
    cont = (tmap.astype(np.float64) + 1.0) / float(base_T)
    return ScheduleTables(
        timestep_map=jnp.asarray(tmap),
        continuous_times=jnp.asarray(cont, dtype=dtype),
        **{k: jnp.asarray(v, dtype=dtype) for k, v in d.items()},
    )


def build_sd_tables(use_timesteps: Iterable[int], *,
                    base_schedule: str = "sqrt_linear",
                    base_num_steps: int = 1000,
                    linear_start: float = 0.00085,
                    linear_end: float = 0.012,
                    base_betas: Optional[np.ndarray] = None,
                    dtype=jnp.float32) -> ScheduleTables:
    """Tables with CompVis DDIM/PLMS semantics
    (ldm/modules/diffusionmodules/util.py:64-76 make_ddim_sampling_parameters).

    Differs from :func:`build_tables` in one quirk: alphas_cumprod_prev[0] is
    alpha_bar[0] of the *base* process (not 1.0), matching
    ``alphas_prev = [alphacums[0]] + alphacums[steps[:-1]]``. Note CompVis's
    "linear" schedule is sqrt-space linear (ddpm.py register_schedule), i.e.
    ``sqrt_linear`` here.
    """
    if base_betas is None:
        base_betas = make_beta_schedule(base_schedule, base_num_steps,
                                        linear_start=linear_start,
                                        linear_end=linear_end)
    base_betas = np.asarray(base_betas, dtype=np.float64)
    T = len(base_betas)
    steps = sorted(set(int(t) for t in use_timesteps))
    if not steps:
        raise ValueError("use_timesteps must be non-empty")
    if steps[0] < 0 or steps[-1] >= T:
        raise ValueError(f"timesteps must lie in [0, {T})")
    abar = np.cumprod(1.0 - base_betas)
    a = abar[steps]
    a_prev = np.concatenate([[abar[0]], a[:-1]])
    # synthesize per-step betas consistent with (a, a_prev) and reuse the
    # generic derivation; then overwrite the cumulative-product fields with
    # the exact CompVis arrays
    betas_k = 1.0 - a / a_prev
    with np.errstate(divide="ignore", invalid="ignore"):
        d = _derive(betas_k)
    # The posterior fields must come from the EXACT CompVis (a, a_prev)
    # arrays: when the subset contains step 0 the alphas_prev quirk makes
    # betas_k[0] == 0, so _derive's internal cumprod puts abar[0] at 1.0
    # and its posterior fields become 0/0 NaN (and plvc -inf) — routine
    # for EA candidates drawn from range(0, 1000).
    pv = betas_k * (1.0 - a_prev) / (1.0 - a)
    plvc = (np.log(np.append(pv[1], pv[1:])) if len(betas_k) > 1
            else np.log(np.maximum(pv, 1e-20)))
    d.update(
        posterior_variance=pv,
        posterior_log_variance_clipped=plvc,
        posterior_mean_coef1=betas_k * np.sqrt(a_prev) / (1.0 - a),
        posterior_mean_coef2=((1.0 - a_prev) * np.sqrt(1.0 - betas_k)
                              / (1.0 - a)),
        alphas_cumprod=a,
        alphas_cumprod_prev=a_prev,
        alphas_cumprod_next=np.append(a[1:], 0.0),
        sqrt_alphas_cumprod=np.sqrt(a),
        sqrt_one_minus_alphas_cumprod=np.sqrt(1.0 - a),
        log_one_minus_alphas_cumprod=np.log(1.0 - a),
        sqrt_recip_alphas_cumprod=np.sqrt(1.0 / a),
        sqrt_recipm1_alphas_cumprod=np.sqrt(1.0 / a - 1.0),
    )
    tmap = np.asarray(steps, dtype=np.int32)
    cont = (tmap.astype(np.float64) + 1.0) / float(T)
    return ScheduleTables(
        timestep_map=jnp.asarray(tmap),
        continuous_times=jnp.asarray(cont, dtype=dtype),
        **{k: jnp.asarray(v, dtype=dtype) for k, v in d.items()},
    )


def stack_tables(tables: Sequence[ScheduleTables]) -> ScheduleTables:
    """Stack same-K tables along a new leading candidate axis (for vmap)."""
    ks = {t.num_steps for t in tables}
    if len(ks) != 1:
        raise ValueError(f"all candidates must share K; got K in {sorted(ks)}")
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, axis=0), *tables)
