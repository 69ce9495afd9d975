"""Diffusion sampling as a single ``lax.scan`` over ScheduleTables.

Functional re-design of guided_diffusion/gaussian_diffusion.py:232-716
(p_mean_variance, condition_mean/condition_score, p_sample_loop,
ddim_sample_loop) and respace.py:115-127 (timestep remapping): the sampler is
a pure jittable function of (model_fn, tables, rng). A searched candidate is
just different table *contents*; K is the only shape parameter, so one
compilation serves an entire evolutionary search.

model_fn signature: ``model_fn(x, t_orig, step_idx) -> [B,H,W,C or 2C]``
where ``t_orig`` is the original-process timestep (tables.timestep_map[i])
and ``step_idx`` the respaced index — the latter lets joint-search callers
select a per-step layer mask without any host-side ``.index()`` call (the
reference does ``timestep_map.index(t[0])`` on host per model call,
search_dynamic_unet...progressive.py:392-397).

cond_fn signature: ``cond_fn(x, t_orig) -> grad log p(y|x)`` of the same
shape as x (classifier guidance).
"""

from __future__ import annotations

import enum
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..schedules import ScheduleTables

__all__ = [
    "ModelMeanType", "ModelVarType",
    "q_sample", "q_posterior_mean_variance", "p_mean_variance",
    "p_sample_loop", "ddim_sample_loop",
]


class ModelMeanType(enum.Enum):
    PREVIOUS_X = "previous_x"
    START_X = "start_x"
    EPSILON = "epsilon"


class ModelVarType(enum.Enum):
    LEARNED = "learned"
    FIXED_SMALL = "fixed_small"
    FIXED_LARGE = "fixed_large"
    LEARNED_RANGE = "learned_range"


def _at(arr: jnp.ndarray, i, x_ndim: int) -> jnp.ndarray:
    """tables[..., i] broadcast against an x of rank ``x_ndim``
    (gaussian_diffusion.py:910-923 _extract_into_tensor)."""
    v = arr[..., i]
    return v.reshape(v.shape + (1,) * x_ndim)


def q_sample(tables: ScheduleTables, x_start, i, noise):
    """Diffuse x_start to respaced step i (gaussian_diffusion.py:188-210)."""
    nd = x_start.ndim - 1
    return (_at(tables.sqrt_alphas_cumprod, i, nd) * x_start
            + _at(tables.sqrt_one_minus_alphas_cumprod, i, nd) * noise)


def q_posterior_mean_variance(tables: ScheduleTables, x_start, x_t, i):
    """q(x_{i-1} | x_i, x_0) (gaussian_diffusion.py:212-230)."""
    nd = x_t.ndim - 1
    mean = (_at(tables.posterior_mean_coef1, i, nd) * x_start
            + _at(tables.posterior_mean_coef2, i, nd) * x_t)
    var = _at(tables.posterior_variance, i, nd)
    log_var = _at(tables.posterior_log_variance_clipped, i, nd)
    return mean, var, log_var


def _split_model_output(model_out, x, var_type: ModelVarType):
    if var_type in (ModelVarType.LEARNED, ModelVarType.LEARNED_RANGE):
        c = x.shape[-1]
        assert model_out.shape[-1] == 2 * c, (model_out.shape, x.shape)
        return model_out[..., :c], model_out[..., c:]
    return model_out, None


def p_mean_variance(tables: ScheduleTables, model_out, x, i, *,
                    mean_type: ModelMeanType, var_type: ModelVarType,
                    clip_denoised: bool = True,
                    denoised_fn: Optional[Callable] = None):
    """Model output -> (mean, variance, log_variance, pred_xstart) of
    p(x_{i-1} | x_i) (gaussian_diffusion.py:232-326)."""
    nd = x.ndim - 1
    out, var_values = _split_model_output(model_out, x, var_type)

    if var_type == ModelVarType.LEARNED:
        log_variance = var_values
        variance = jnp.exp(log_variance)
    elif var_type == ModelVarType.LEARNED_RANGE:
        min_log = _at(tables.posterior_log_variance_clipped, i, nd)
        max_log = jnp.log(_at(tables.betas, i, nd))
        frac = (var_values + 1) / 2
        log_variance = frac * max_log + (1 - frac) * min_log
        variance = jnp.exp(log_variance)
    elif var_type == ModelVarType.FIXED_LARGE:
        # betas with variance[0] replaced by posterior_variance[1]
        # (gaussian_diffusion.py:278-289). NB: the i==0 condition must be
        # broadcast-shaped like _at's outputs — a bare [B] vector would
        # broadcast along the CHANNEL axis ((B,1,1,B) variance: crash, or
        # silently wrong numbers when B == C).
        k1 = min(1, tables.num_steps - 1)
        cond = jnp.equal(i, 0)
        cond = cond.reshape(jnp.shape(cond) + (1,) * nd)
        variance = jnp.where(cond,
                             _at(tables.posterior_variance, k1, nd),
                             _at(tables.betas, i, nd))
        log_variance = jnp.log(variance)
    elif var_type == ModelVarType.FIXED_SMALL:
        variance = _at(tables.posterior_variance, i, nd)
        log_variance = _at(tables.posterior_log_variance_clipped, i, nd)
    else:
        raise NotImplementedError(var_type)

    def process(x0):
        if denoised_fn is not None:
            x0 = denoised_fn(x0)
        return jnp.clip(x0, -1.0, 1.0) if clip_denoised else x0

    if mean_type == ModelMeanType.PREVIOUS_X:
        # x0 from predicted x_{i-1} (gaussian_diffusion.py:336-345)
        pred_xstart = process(
            _at(1.0 / tables.posterior_mean_coef1, i, nd) * out
            - _at(tables.posterior_mean_coef2 / tables.posterior_mean_coef1, i, nd) * x)
        mean = out
    elif mean_type == ModelMeanType.START_X:
        pred_xstart = process(out)
        mean, _, _ = q_posterior_mean_variance(tables, pred_xstart, x, i)
    elif mean_type == ModelMeanType.EPSILON:
        pred_xstart = process(_predict_xstart_from_eps(tables, x, i, out))
        mean, _, _ = q_posterior_mean_variance(tables, pred_xstart, x, i)
    else:
        raise NotImplementedError(mean_type)
    return mean, variance, log_variance, pred_xstart


def _predict_xstart_from_eps(tables, x, i, eps):
    nd = x.ndim - 1
    return (_at(tables.sqrt_recip_alphas_cumprod, i, nd) * x
            - _at(tables.sqrt_recipm1_alphas_cumprod, i, nd) * eps)


def _predict_eps_from_xstart(tables, x, i, x0):
    nd = x.ndim - 1
    return ((_at(tables.sqrt_recip_alphas_cumprod, i, nd) * x - x0)
            / _at(tables.sqrt_recipm1_alphas_cumprod, i, nd))


def _loop(body, tables: ScheduleTables, shape, rng, noise, unroll=1):
    K = tables.num_steps
    x_T = jax.random.normal(rng, shape) if noise is None else noise
    # the body's math promotes to the (f32) table dtype; a bf16 noise=
    # input would otherwise mismatch the scan carry dtype at trace time
    x_T = x_T.astype(tables.betas.dtype)
    idxs = jnp.arange(K - 1, -1, -1)
    final, _ = jax.lax.scan(body, x_T, idxs, unroll=unroll)
    return final


def p_sample_loop(model_fn, shape, tables: ScheduleTables, *, rng,
                  mean_type: ModelMeanType = ModelMeanType.EPSILON,
                  var_type: ModelVarType = ModelVarType.LEARNED_RANGE,
                  clip_denoised: bool = True,
                  denoised_fn: Optional[Callable] = None,
                  cond_fn: Optional[Callable] = None,
                  noise: Optional[jnp.ndarray] = None,
                  unroll: int = 1) -> jnp.ndarray:
    """Ancestral sampling (gaussian_diffusion.py:395-534). Returns x_0."""
    rng, init_rng = jax.random.split(rng)

    def body(x, i):
        t = tables.timestep_map[..., i]
        model_out = model_fn(x, _bcast_t(t, shape[0]), i)
        mean, variance, log_variance, pred_x0 = p_mean_variance(
            tables, model_out, x, i, mean_type=mean_type, var_type=var_type,
            clip_denoised=clip_denoised, denoised_fn=denoised_fn)
        if cond_fn is not None:
            # Sohl-Dickstein guidance: shift the mean by variance * grad
            # (gaussian_diffusion.py:356-369 condition_mean)
            mean = mean + variance * cond_fn(x, _bcast_t(t, shape[0]))
        z = jax.random.normal(jax.random.fold_in(rng, i), x.shape)
        nonzero = jnp.where(jnp.equal(i, 0), 0.0, 1.0)
        sample = mean + nonzero * jnp.exp(0.5 * log_variance) * z
        return sample, ()

    return _loop(body, tables, shape, init_rng, noise, unroll)


def ddim_sample_loop(model_fn, shape, tables: ScheduleTables, *, rng,
                     eta: float = 0.0,
                     mean_type: ModelMeanType = ModelMeanType.EPSILON,
                     var_type: ModelVarType = ModelVarType.LEARNED_RANGE,
                     clip_denoised: bool = True,
                     denoised_fn: Optional[Callable] = None,
                     cond_fn: Optional[Callable] = None,
                     noise: Optional[jnp.ndarray] = None,
                     final_step_noise: bool = False,
                     unroll: int = 1) -> jnp.ndarray:
    """DDIM sampling, eq. 12 of Song et al.
    (gaussian_diffusion.py:536-716). Returns x_0."""
    rng, init_rng = jax.random.split(rng)
    nd = len(shape) - 1

    def body(x, i):
        t = tables.timestep_map[..., i]
        model_out = model_fn(x, _bcast_t(t, shape[0]), i)
        _, _, _, pred_x0 = p_mean_variance(
            tables, model_out, x, i, mean_type=mean_type, var_type=var_type,
            clip_denoised=clip_denoised, denoised_fn=denoised_fn)
        eps = _predict_eps_from_xstart(tables, x, i, pred_x0)
        if cond_fn is not None:
            # Song guidance on the score (gaussian_diffusion.py:371-393
            # condition_score): used by the reference for DDIM.
            eps = eps - (_at(tables.sqrt_one_minus_alphas_cumprod, i, nd)
                         * cond_fn(x, _bcast_t(t, shape[0])))
            # NB: the reference does NOT re-clip pred_xstart after guidance
            # (gaussian_diffusion.py:371-393)
            pred_x0 = _predict_xstart_from_eps(tables, x, i, eps)

        abar = _at(tables.alphas_cumprod, i, nd)
        abar_prev = _at(tables.alphas_cumprod_prev, i, nd)
        sigma = (eta * jnp.sqrt((1 - abar_prev) / (1 - abar))
                 * jnp.sqrt(1 - abar / abar_prev))
        mean_pred = (pred_x0 * jnp.sqrt(abar_prev)
                     + jnp.sqrt(1 - abar_prev - sigma ** 2) * eps)
        z = jax.random.normal(jax.random.fold_in(rng, i), x.shape)
        # ADM zeroes the stochastic term at the final respaced step
        # (its sigma[0] is 0 anyway since alphas_cumprod_prev[0]=1);
        # CompVis DDIM adds sigma*z at EVERY step, and with build_sd_tables
        # the alphas_prev quirk makes sigma[0] nonzero whenever step 0 is
        # not in the subset — final_step_noise=True selects that semantics
        # (only observable at eta > 0).
        nonzero = (1.0 if final_step_noise
                   else jnp.where(jnp.equal(i, 0), 0.0, 1.0))
        sample = mean_pred + nonzero * sigma * z
        return sample, ()

    return _loop(body, tables, shape, init_rng, noise, unroll)


def _bcast_t(t, batch: int) -> jnp.ndarray:
    return jnp.broadcast_to(jnp.asarray(t, jnp.float32), (batch,))
