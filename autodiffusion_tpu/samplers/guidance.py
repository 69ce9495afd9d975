"""Guidance: classifier gradients (ADM-G) and classifier-free guidance.

The reference computes classifier gradients with torch.autograd inside the
sampling loop (search_imagenet64_classifier_guidance.py:319-326). Here it is
``jax.grad`` of the selected log-softmax, fully inside the jitted scan.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

__all__ = ["classifier_cond_fn", "cfg_model_fn"]


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


def cfg_model_fn(model_fn: Callable, guidance_scale: float,
                 uncond_kwargs: dict, cond_kwargs: dict) -> Callable:
    """Classifier-free guidance via the 2x-batch trick (ddim.py:184-191):
    eps = eps_uncond + scale * (eps_cond - eps_uncond). Extra model-output
    channels (learned variance) are taken from the conditional branch.

    ``model_fn(x, t, step_idx, **kwargs)``; kwargs dicts carry e.g. the CLIP
    context for the conditional and empty-prompt branches.
    """

    def guided_batched(x, t, i):
        # single batched model call over [cond | uncond]
        x2 = jnp.concatenate([x, x], axis=0)
        t2 = jnp.concatenate([t, t], axis=0)
        kwargs = jax.tree_util.tree_map(
            lambda c, u: jnp.concatenate([c, u], axis=0),
            cond_kwargs, uncond_kwargs)
        out = model_fn(x2, t2, i, **kwargs)
        c = x.shape[-1]
        eps_c, eps_u = out[: x.shape[0], ..., :c], out[x.shape[0]:, ..., :c]
        eps = eps_u + guidance_scale * (eps_c - eps_u)
        if out.shape[-1] > c:
            rest = out[: x.shape[0], ..., c:]
            eps = jnp.concatenate([eps, rest], axis=-1)
        return eps

    return guided_batched
