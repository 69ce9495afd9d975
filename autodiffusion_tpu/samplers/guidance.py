"""Guidance: classifier gradients (ADM-G) and classifier-free guidance.

The reference computes classifier gradients with torch.autograd inside the
sampling loop (search_imagenet64_classifier_guidance.py:319-326). Here it is
``jax.grad`` of the selected log-softmax, fully inside the jitted scan.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

__all__ = ["classifier_cond_fn", "cfg_eps_fn"]


def classifier_cond_fn(classifier_fn: Callable, y: jnp.ndarray,
                       scale: float = 1.0) -> Callable:
    """cond_fn(x, t) = scale * grad_x log p(y | x, t).

    ``classifier_fn(x, t) -> logits [B, num_classes]``. Matches the reference
    cond_fn: sum of per-example selected log-softmax, then autograd
    (search_imagenet64_classifier_guidance.py:319-326).
    """

    def cond_fn(x, t):
        def selected_logp(x_in):
            logits = classifier_fn(x_in, t)
            logp = jax.nn.log_softmax(logits, axis=-1)
            return jnp.take_along_axis(logp, y[:, None], axis=-1).sum()

        return scale * jax.grad(selected_logp)(x)

    return cond_fn


def cfg_eps_fn(apply_fn: Callable, ctx: jnp.ndarray, uncond_ctx: jnp.ndarray,
               guidance_scale: float,
               prompt_mask: "jnp.ndarray | None" = None) -> Callable:
    """Classifier-free guidance via the 2x-batch trick, reference batch
    order [uncond | cond] (ddim.py:184-191: cat([uc, c]) then chunk(2) ->
    e_t_uncond, e_t): eps = eps_u + scale * (eps_c - eps_u).

    ``apply_fn(x2, t2, ctx2) -> eps`` is the raw conditional model over the
    doubled batch. ``prompt_mask`` (optional [K] 0/1 vector, the
    txt2img_prompt_mask.py ablation) zeroes the guidance at masked steps.
    Returns ``guided(x, t, i) -> eps`` for the scan samplers.
    """
    if uncond_ctx.ndim < ctx.ndim:
        uncond_ctx = jnp.broadcast_to(uncond_ctx[None], ctx.shape)

    def guided(x, t, i=None):
        n = x.shape[0]
        out = apply_fn(jnp.concatenate([x, x], axis=0),
                       jnp.concatenate([t, t], axis=0),
                       jnp.concatenate([uncond_ctx, ctx], axis=0))
        e_u, e_c = out[:n], out[n:]
        s = guidance_scale
        if prompt_mask is not None:
            if i is None:
                # fail loud at trace time: a sampler that doesn't thread
                # the step index (DPM-Solver's continuous-time loops)
                # would otherwise silently apply FULL guidance at every
                # step, making the ablation measure nothing
                raise ValueError(
                    "prompt_mask requires a sampler that passes the step "
                    "index (ddim/plms); the dpm_solver loops do not")
            s = s * prompt_mask[i]
        return e_u + s * (e_c - e_u)

    return guided
