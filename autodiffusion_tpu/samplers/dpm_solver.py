"""DPM-Solver / DPM-Solver++ (multistep, order 1-3) over searched times.

Re-design of ldm/models/diffusion/dpm_solver/dpm_solver.py for the searched
setting: AutoDiffusion's SD search mutates the *continuous time knots*
(sd/scripts/search_ea.py:371-502), so the sampler is a lax.scan over a
[K+1] vector of descending times in (0, 1] — a new candidate is just a
different time vector, no recompilation.

Matches the reference configuration (sampler.py:81): multistep, order 2,
lower_order_final=True, predict_x0=True (i.e. DPM-Solver++ data-prediction
updates, dpm_solver.py:516-534,755-796,815-857), discrete noise schedule
with piecewise-linear log-alpha interpolation (NoiseScheduleVP 'discrete')
and model input time (t - 1/N) * N (model_wrapper.get_model_input_time).

model_fn(x, t_model) -> eps; classifier-free guidance goes inside model_fn.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["DiscreteNoiseSchedule", "dpm_solver_sample_loop",
           "dpm_solver_times"]


class DiscreteNoiseSchedule(NamedTuple):
    """Piecewise-linear interpolation of 0.5*log(alpha_bar) over t=(i+1)/N."""

    t_array: jnp.ndarray           # [N]
    log_alpha_array: jnp.ndarray   # [N]

    @classmethod
    def from_betas(cls, betas: np.ndarray) -> "DiscreteNoiseSchedule":
        betas = np.asarray(betas, dtype=np.float64)
        return cls.from_alphas_cumprod(np.cumprod(1.0 - betas))

    @classmethod
    def from_alphas_cumprod(cls, abar: np.ndarray) -> "DiscreteNoiseSchedule":
        abar = np.asarray(abar, dtype=np.float64)
        n = len(abar)
        t = (np.arange(n, dtype=np.float64) + 1.0) / n
        return cls(jnp.asarray(t, jnp.float32),
                   jnp.asarray(0.5 * np.log(abar), jnp.float32))

    def marginal_log_mean_coeff(self, t):
        return jnp.interp(t, self.t_array, self.log_alpha_array)

    def marginal_alpha(self, t):
        return jnp.exp(self.marginal_log_mean_coeff(t))

    def marginal_std(self, t):
        return jnp.sqrt(1.0 - jnp.exp(2.0 * self.marginal_log_mean_coeff(t)))

    def marginal_lambda(self, t):
        log_a = self.marginal_log_mean_coeff(t)
        return log_a - 0.5 * jnp.log(1.0 - jnp.exp(2.0 * log_a))

    def model_input_time(self, t):
        n = self.t_array.shape[-1]
        return (t - 1.0 / n) * n


def dpm_solver_times(num_steps: int, t_0: float = 1e-3, t_T: float = 1.0) -> np.ndarray:
    """Uniform-in-t default knots, descending [K+1] ('time_uniform')."""
    return np.linspace(t_T, t_0, num_steps + 1)


def dpm_solver_sample_loop(model_fn: Callable, shape,
                           schedule: DiscreteNoiseSchedule,
                           times: jnp.ndarray, *, rng,
                           order: int = 2, lower_order_final: bool = True,
                           predict_x0: bool = True,
                           noise: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Multistep DPM-Solver over descending ``times`` [K+1] (batchable under
    vmap on a leading axis). Returns x at times[-1]. NFE = K."""
    assert order in (1, 2, 3)
    K = times.shape[-1] - 1
    nd = len(shape) - 1

    def bshape(v):
        # scalar -> (1,..,1); per-sample [N] -> (N,1,..,1) (times may carry a
        # leading batch axis when candidates are folded into the batch)
        v = jnp.asarray(v)
        return v.reshape(v.shape + (1,) * nd)

    def t_at(i):
        return times[..., i]

    def model_value(x, t):
        """eps -> the solver's model value (x0 under predict_x0)."""
        t_model = schedule.model_input_time(t)
        eps = model_fn(x, jnp.broadcast_to(t_model, (shape[0],)))
        if predict_x0:
            alpha, sigma = schedule.marginal_alpha(t), schedule.marginal_std(t)
            return (x - bshape(sigma) * eps) / bshape(alpha)
        return eps

    def update(x, i, m_hist, count):
        """Multistep update from times[i] to times[i+1]; m_hist newest-first."""
        s, t = t_at(i), t_at(i + 1)
        lam_s, lam_t = schedule.marginal_lambda(s), schedule.marginal_lambda(t)
        sigma_s, sigma_t = schedule.marginal_std(s), schedule.marginal_std(t)
        log_a_s = schedule.marginal_log_mean_coeff(s)
        log_a_t = schedule.marginal_log_mean_coeff(t)
        alpha_t = jnp.exp(log_a_t)
        h = lam_t - lam_s
        m0 = m_hist[0]

        # previous knots for the difference terms
        s1 = t_at(jnp.maximum(i - 1, 0))
        s2 = t_at(jnp.maximum(i - 2, 0))
        lam_1, lam_2 = schedule.marginal_lambda(s1), schedule.marginal_lambda(s2)
        safe = lambda v: jnp.where(v == 0, 1.0, v)
        r0 = (lam_s - lam_1) / safe(h)
        r1 = (lam_1 - lam_2) / safe(h)
        d1_0 = (m0 - m_hist[1]) / bshape(safe(r0))
        d1_1 = (m_hist[1] - m_hist[2]) / bshape(safe(r1))
        d1 = d1_0 + bshape(r0 / safe(r0 + r1)) * (d1_0 - d1_1)
        d2 = (d1_0 - d1_1) / bshape(safe(r0 + r1))

        if predict_x0:
            phi1 = jnp.expm1(-h)
            base = bshape(sigma_t / sigma_s) * x - bshape(alpha_t * phi1) * m0
            x1 = base
            x2 = base - bshape(0.5 * alpha_t * phi1) * d1_0
            x3 = (base + bshape(alpha_t * (phi1 / h + 1.0)) * d1
                  - bshape(alpha_t * ((phi1 + h) / h ** 2 - 0.5)) * d2)
        else:
            phi1 = jnp.expm1(h)
            base = bshape(jnp.exp(log_a_t - log_a_s)) * x - bshape(sigma_t * phi1) * m0
            x1 = base
            x2 = base - bshape(0.5 * sigma_t * phi1) * d1_0
            x3 = (base - bshape(sigma_t * (phi1 / h - 1.0)) * d1
                  - bshape(sigma_t * ((phi1 - h) / h ** 2 - 0.5)) * d2)

        # warmup by lower orders (dpm_solver.py:1103-1107); taper the final
        # steps back down (min(order, steps+1-step) when steps < 15,
        # dpm_solver.py:1111-1114)
        eff = jnp.minimum(count + 1, order)
        if lower_order_final and K < 15:
            eff = jnp.minimum(eff, K - i)
        return jax.lax.switch(eff - 1, [lambda _: x1, lambda _: x2,
                                        lambda _: x3], None)

    x_T = jax.random.normal(rng, shape) if noise is None else noise
    m0 = model_value(x_T, t_at(0))
    hist0 = jnp.stack([m0, m0, m0])

    def body(carry, i):
        x, hist, count = carry
        x = update(x, i, hist, count)

        def evaluate(_):
            m = model_value(x, t_at(i + 1))
            return jnp.stack([m, hist[0], hist[1]])

        # the final model value is never used (dpm_solver.py:1124-1126)
        hist = jax.lax.cond(i < K - 1, evaluate, lambda _: hist, None)
        return (x, hist, count + 1), ()

    (x, _, _), _ = jax.lax.scan(body, (x_T, hist0, jnp.int32(0)),
                                jnp.arange(K))
    return x
