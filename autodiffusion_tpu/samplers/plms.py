"""PLMS (pseudo linear multistep) sampler as a lax.scan.

Re-design of ldm/models/diffusion/plms.py:121-258: Adams-Bashforth orders
1-4 on the eps history, with the pseudo-improved-Euler double model call on
the first step. The eps history rides in the scan carry (fixed [3, ...]
buffer + valid count), so arbitrary searched schedules reuse one compiled
graph, like the DDIM loop.

model_fn(x, t, i) -> eps (classifier-free guidance goes inside model_fn via
samplers.guidance.cfg_eps_fn, matching plms.py:200-207).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..schedules import ScheduleTables

__all__ = ["plms_sample_loop"]


def plms_sample_loop(model_fn: Callable, shape, tables: ScheduleTables, *,
                     rng, noise: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """PLMS sampling (eta is structurally 0, plms.py:25-27). Returns x_0."""
    K = tables.num_steps
    nd = len(shape) - 1

    def bshape(v):
        # scalar -> (1,1,1); per-sample [N] -> (N,1,1,1): tables may carry a
        # leading batch axis when candidates are folded into the batch
        return v.reshape(v.shape + (1,) * nd)

    def coeffs(i):
        a_t = bshape(tables.alphas_cumprod[..., i])
        a_prev = bshape(tables.alphas_cumprod_prev[..., i])
        sqrt_om = bshape(tables.sqrt_one_minus_alphas_cumprod[..., i])
        return a_t, a_prev, sqrt_om

    def x_prev_from(x, e_t, i):
        a_t, a_prev, sqrt_om = coeffs(i)
        pred_x0 = (x - sqrt_om * e_t) / jnp.sqrt(a_t)
        dir_xt = jnp.sqrt(1.0 - a_prev) * e_t
        return jnp.sqrt(a_prev) * pred_x0 + dir_xt

    def t_of(i):
        return jnp.broadcast_to(
            tables.timestep_map[..., i].astype(jnp.float32), (shape[0],))

    def body(carry, k):
        x, hist, count = carry          # hist: [3, *shape] newest-first
        i = K - 1 - k                   # step index, descending
        e_t = model_fn(x, t_of(i), i).astype(x.dtype)

        def order1(_):
            # pseudo improved Euler: second eval at the next (lower) step
            x_prev0 = x_prev_from(x, e_t, i)
            i_next = jnp.maximum(i - 1, 0)
            e_t_next = model_fn(x_prev0, t_of(i_next),
                                 i_next).astype(x.dtype)
            return (e_t + e_t_next) / 2

        def order2(_):
            return (3 * e_t - hist[0]) / 2

        def order3(_):
            return (23 * e_t - 16 * hist[0] + 5 * hist[1]) / 12

        def order4(_):
            return (55 * e_t - 59 * hist[0] + 37 * hist[1] - 9 * hist[2]) / 24

        e_prime = jax.lax.switch(jnp.minimum(count, 3),
                                 [order1, order2, order3, order4], None)
        x_next = x_prev_from(x, e_prime, i)
        hist = jnp.concatenate([e_t[None], hist[:2]], axis=0)
        return (x_next, hist, count + 1), ()

    x_T = jax.random.normal(rng, shape) if noise is None else noise
    # pin the whole loop to the (f32) table dtype: a bf16 model output
    # or noise= input would otherwise give lax.switch branches / the
    # scan carry mismatched dtypes at trace time
    x_T = x_T.astype(tables.betas.dtype)
    hist0 = jnp.zeros((3,) + tuple(shape), tables.betas.dtype)
    (x, _, _), _ = jax.lax.scan(body, (x_T, hist0, jnp.int32(0)),
                                jnp.arange(K))
    return x
