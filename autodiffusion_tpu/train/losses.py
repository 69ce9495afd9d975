"""Training losses: MSE / rescaled-MSE / KL variational bound.

Functional port of guided_diffusion/losses.py:12-77 (normal_kl, discretized
gaussian log-likelihood) and gaussian_diffusion.py:718-832 (_vb_terms_bpd,
training_losses), with the variance-learning stop-gradient trick kept: the
VLB term sees a frozen mean so learned-sigma training doesn't fight the MSE
objective.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..samplers.diffusion import (ModelMeanType, ModelVarType, _at,
                                  _predict_eps_from_xstart, p_mean_variance,
                                  q_posterior_mean_variance, q_sample)
from ..schedules import ScheduleTables

__all__ = ["normal_kl", "discretized_gaussian_log_likelihood", "vb_terms_bpd",
           "training_losses", "calc_bpd_loop", "LossType"]


class LossType:
    MSE = "mse"
    RESCALED_MSE = "rescaled_mse"
    KL = "kl"
    RESCALED_KL = "rescaled_kl"


def normal_kl(mean1, logvar1, mean2, logvar2):
    """KL(N(mean1, e^logvar1) || N(mean2, e^logvar2)) per element (nats)."""
    return 0.5 * (-1.0 + logvar2 - logvar1 + jnp.exp(logvar1 - logvar2)
                  + ((mean1 - mean2) ** 2) * jnp.exp(-logvar2))


def approx_standard_normal_cdf(x):
    return 0.5 * (1.0 + jnp.tanh(jnp.sqrt(2.0 / jnp.pi) * (x + 0.044715 * x ** 3)))


def discretized_gaussian_log_likelihood(x, *, means, log_scales):
    """Log-likelihood of discretized-to-255-bins data under a Gaussian
    (losses.py:50-77). x in [-1, 1]."""
    centered = x - means
    inv_stdv = jnp.exp(-log_scales)
    plus_in = inv_stdv * (centered + 1.0 / 255.0)
    cdf_plus = approx_standard_normal_cdf(plus_in)
    min_in = inv_stdv * (centered - 1.0 / 255.0)
    cdf_min = approx_standard_normal_cdf(min_in)
    log_cdf_plus = jnp.log(jnp.clip(cdf_plus, min=1e-12))
    log_one_minus_cdf_min = jnp.log(jnp.clip(1.0 - cdf_min, min=1e-12))
    cdf_delta = cdf_plus - cdf_min
    return jnp.where(
        x < -0.999, log_cdf_plus,
        jnp.where(x > 0.999, log_one_minus_cdf_min,
                  jnp.log(jnp.clip(cdf_delta, min=1e-12))))


def mean_flat(x):
    return x.reshape(x.shape[0], -1).mean(axis=-1)


def vb_terms_bpd(tables: ScheduleTables, model_out, x_start, x_t, t, *,
                 mean_type: ModelMeanType, var_type: ModelVarType,
                 clip_denoised: bool = False):
    """KL(q(x_{t-1}|x_t,x_0) || p(x_{t-1}|x_t)) in bits (or decoder NLL at
    t=0), gaussian_diffusion.py:718-751."""
    true_mean, _, true_log_var = q_posterior_mean_variance(tables, x_start, x_t, t)
    mean, _, log_var, pred_x0 = p_mean_variance(
        tables, model_out, x_t, t, mean_type=mean_type, var_type=var_type,
        clip_denoised=clip_denoised)
    kl = mean_flat(normal_kl(true_mean, true_log_var, mean, log_var)) / jnp.log(2.0)
    decoder_nll = -mean_flat(discretized_gaussian_log_likelihood(
        x_start, means=mean, log_scales=0.5 * log_var)) / jnp.log(2.0)
    return jnp.where(jnp.equal(t, 0), decoder_nll, kl), pred_x0


def training_losses(tables: ScheduleTables, model_fn, x_start, t, rng, *,
                    mean_type: ModelMeanType = ModelMeanType.EPSILON,
                    var_type: ModelVarType = ModelVarType.LEARNED_RANGE,
                    loss_type: str = LossType.MSE,
                    noise: Optional[jnp.ndarray] = None) -> Dict[str, jnp.ndarray]:
    """Per-example training losses (gaussian_diffusion.py:753-832).

    model_fn(x_t, t_orig) -> model output; t is the respaced step index [B].
    """
    if noise is None:
        noise = jax.random.normal(rng, x_start.shape)
    x_t = q_sample(tables, x_start, t, noise)
    t_orig = tables.timestep_map[t].astype(jnp.float32)
    terms: Dict[str, jnp.ndarray] = {}

    if loss_type in (LossType.KL, LossType.RESCALED_KL):
        model_out = model_fn(x_t, t_orig)
        vb, _ = vb_terms_bpd(tables, model_out, x_start, x_t, t,
                             mean_type=mean_type, var_type=var_type)
        terms["loss"] = vb * tables.num_steps if loss_type == LossType.RESCALED_KL else vb
        return terms

    model_out = model_fn(x_t, t_orig)
    if var_type in (ModelVarType.LEARNED, ModelVarType.LEARNED_RANGE):
        c = x_start.shape[-1]
        eps_out, var_values = model_out[..., :c], model_out[..., c:]
        # variance-only VLB: freeze the mean prediction so the vb term only
        # trains the variance head (gaussian_diffusion.py:792-806)
        frozen = jnp.concatenate([jax.lax.stop_gradient(eps_out), var_values],
                                 axis=-1)
        vb, _ = vb_terms_bpd(tables, frozen, x_start, x_t, t,
                             mean_type=mean_type, var_type=var_type)
        if loss_type == LossType.RESCALED_MSE:
            vb = vb * tables.num_steps / 1000.0
        terms["vb"] = vb
        model_out = eps_out

    if mean_type == ModelMeanType.EPSILON:
        target = noise
    elif mean_type == ModelMeanType.START_X:
        target = x_start
    elif mean_type == ModelMeanType.PREVIOUS_X:
        target, _, _ = q_posterior_mean_variance(tables, x_start, x_t, t)
    else:
        raise NotImplementedError(mean_type)
    terms["mse"] = mean_flat((target - model_out) ** 2)
    terms["loss"] = terms["mse"] + terms.get("vb", 0.0)
    return terms


def _prior_bpd(tables: ScheduleTables, x_start):
    """KL(q(x_T | x_0) || N(0, I)) in bits (gaussian_diffusion.py:834-850)."""
    i = tables.num_steps - 1
    nd = x_start.ndim - 1
    mean = _at(tables.sqrt_alphas_cumprod, i, nd) * x_start
    log_var = _at(tables.log_one_minus_alphas_cumprod, i, nd)
    kl = normal_kl(mean, log_var, jnp.zeros_like(mean), jnp.zeros_like(log_var))
    return mean_flat(kl) / jnp.log(2.0)


def calc_bpd_loop(tables: ScheduleTables, model_fn, x_start, rng, *,
                  mean_type: ModelMeanType = ModelMeanType.EPSILON,
                  var_type: ModelVarType = ModelVarType.LEARNED_RANGE,
                  clip_denoised: bool = True) -> Dict[str, jnp.ndarray]:
    """Full variational bound in bits/dim over every timestep
    (gaussian_diffusion.py:852-908; scripts/image_nll.py). Returns per-
    example total_bpd, prior_bpd, and per-(step, example) vb / xstart_mse /
    mse arrays (leading axis = step, ascending t)."""
    B = x_start.shape[0]

    def body(carry, i):
        r = jax.random.fold_in(rng, i)
        noise = jax.random.normal(r, x_start.shape)
        t = jnp.full((B,), i, jnp.int32)
        x_t = q_sample(tables, x_start, t, noise)
        t_orig = tables.timestep_map[t].astype(jnp.float32)
        model_out = model_fn(x_t, t_orig)
        vb, pred_x0 = vb_terms_bpd(tables, model_out, x_start, x_t, t,
                                   mean_type=mean_type, var_type=var_type,
                                   clip_denoised=clip_denoised)
        eps = _predict_eps_from_xstart(tables, x_t, t, pred_x0)
        return carry, (vb, mean_flat((pred_x0 - x_start) ** 2),
                       mean_flat((eps - noise) ** 2))

    _, (vb, xstart_mse, mse) = jax.lax.scan(body, None,
                                            jnp.arange(tables.num_steps))
    prior = _prior_bpd(tables, x_start)
    return {
        "total_bpd": vb.sum(axis=0) + prior,
        "prior_bpd": prior,
        "vb": vb,
        "xstart_mse": xstart_mse,
        "mse": mse,
    }

