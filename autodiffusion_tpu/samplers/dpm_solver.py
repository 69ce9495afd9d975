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
           "dpm_solver_singlestep_loop", "dpm_solver_adaptive_loop",
           "dpm_solver_times", "singlestep_orders", "dpm_model_wrapper"]


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

    def inverse_lambda(self, lamb):
        """t such that marginal_lambda(t) == lamb (dpm_solver.py:158-169,
        'discrete' branch): invert via the same piecewise-linear table."""
        log_alpha = -0.5 * jnp.logaddexp(0.0, -2.0 * lamb)
        # log_alpha_array decreases with t; flip both for ascending interp
        return jnp.interp(log_alpha, self.log_alpha_array[::-1],
                          self.t_array[::-1])


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

    # eps -> the solver's model value (x0 under predict_x0); shared with
    # the singlestep/adaptive loops
    model_value = _model_value_fn(model_fn, schedule, shape, predict_x0)

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


def singlestep_orders(steps: int, order: int) -> list:
    """DPM-Solver-fast order schedule for a fixed NFE budget
    (dpm_solver.py:439-500 get_orders_and_timesteps_for_singlestep_solver)."""
    if order == 3:
        k = steps // 3 + 1
        if steps % 3 == 0:
            return [3] * (k - 2) + [2, 1]
        if steps % 3 == 1:
            return [3] * (k - 1) + [1]
        return [3] * (k - 1) + [2]
    if order == 2:
        if steps % 2 == 0:
            return [2] * (steps // 2)
        return [2] * (steps // 2) + [1]
    if order == 1:
        return [1] * steps
    raise ValueError("order must be 1, 2 or 3")


def _make_singlestep_updates(schedule: DiscreteNoiseSchedule,
                             model_value: Callable, nd: int,
                             predict_x0: bool, solver_type: str):
    """First/second/third singlestep updates from time s to t
    (dpm_solver.py:516-549 first, :551-631 second, :633-733 third; both
    'dpm_solver' and 'taylor' variants, eps and x0 prediction)."""
    assert solver_type in ("dpm_solver", "taylor"), solver_type

    def bshape(v):
        v = jnp.asarray(v)
        return v.reshape(v.shape + (1,) * nd)

    ns = schedule

    def first(x, s, t, m_s=None):
        if m_s is None:
            m_s = model_value(x, s)
        h = ns.marginal_lambda(t) - ns.marginal_lambda(s)
        if predict_x0:
            phi_1 = jnp.expm1(-h)
            x_t = (bshape(ns.marginal_std(t) / ns.marginal_std(s)) * x
                   - bshape(jnp.exp(ns.marginal_log_mean_coeff(t)) * phi_1) * m_s)
        else:
            phi_1 = jnp.expm1(h)
            x_t = (bshape(jnp.exp(ns.marginal_log_mean_coeff(t)
                                  - ns.marginal_log_mean_coeff(s))) * x
                   - bshape(ns.marginal_std(t) * phi_1) * m_s)
        return x_t, m_s

    def second(x, s, t, r1=0.5, m_s=None):
        lam_s, lam_t = ns.marginal_lambda(s), ns.marginal_lambda(t)
        h = lam_t - lam_s
        s1 = ns.inverse_lambda(lam_s + r1 * h)
        log_a_s, log_a_s1, log_a_t = (ns.marginal_log_mean_coeff(u)
                                      for u in (s, s1, t))
        sig_s, sig_s1, sig_t = (ns.marginal_std(u) for u in (s, s1, t))
        alpha_s1, alpha_t = jnp.exp(log_a_s1), jnp.exp(log_a_t)
        if m_s is None:
            m_s = model_value(x, s)
        if predict_x0:
            phi_11, phi_1 = jnp.expm1(-r1 * h), jnp.expm1(-h)
            x_s1 = (bshape(sig_s1 / sig_s) * x
                    - bshape(alpha_s1 * phi_11) * m_s)
            m_s1 = model_value(x_s1, s1)
            if solver_type == "dpm_solver":
                x_t = (bshape(sig_t / sig_s) * x
                       - bshape(alpha_t * phi_1) * m_s
                       - (0.5 / r1) * bshape(alpha_t * phi_1) * (m_s1 - m_s))
            else:
                x_t = (bshape(sig_t / sig_s) * x
                       - bshape(alpha_t * phi_1) * m_s
                       + (1.0 / r1) * bshape(
                           alpha_t * (phi_1 / h + 1.0)) * (m_s1 - m_s))
        else:
            phi_11, phi_1 = jnp.expm1(r1 * h), jnp.expm1(h)
            x_s1 = (bshape(jnp.exp(log_a_s1 - log_a_s)) * x
                    - bshape(sig_s1 * phi_11) * m_s)
            m_s1 = model_value(x_s1, s1)
            if solver_type == "dpm_solver":
                x_t = (bshape(jnp.exp(log_a_t - log_a_s)) * x
                       - bshape(sig_t * phi_1) * m_s
                       - (0.5 / r1) * bshape(sig_t * phi_1) * (m_s1 - m_s))
            else:
                x_t = (bshape(jnp.exp(log_a_t - log_a_s)) * x
                       - bshape(sig_t * phi_1) * m_s
                       - (1.0 / r1) * bshape(
                           sig_t * (phi_1 / h - 1.0)) * (m_s1 - m_s))
        return x_t, m_s, m_s1

    def third(x, s, t, r1=1.0 / 3.0, r2=2.0 / 3.0, m_s=None, m_s1=None):
        lam_s, lam_t = ns.marginal_lambda(s), ns.marginal_lambda(t)
        h = lam_t - lam_s
        s1 = ns.inverse_lambda(lam_s + r1 * h)
        s2 = ns.inverse_lambda(lam_s + r2 * h)
        log_a = {u: ns.marginal_log_mean_coeff(v)
                 for u, v in (("s", s), ("s1", s1), ("s2", s2), ("t", t))}
        sig = {u: ns.marginal_std(v)
               for u, v in (("s", s), ("s1", s1), ("s2", s2), ("t", t))}
        alpha_s1, alpha_s2, alpha_t = (jnp.exp(log_a[u])
                                       for u in ("s1", "s2", "t"))
        if m_s is None:
            m_s = model_value(x, s)
        if predict_x0:
            phi_11, phi_12, phi_1 = (jnp.expm1(-r1 * h), jnp.expm1(-r2 * h),
                                     jnp.expm1(-h))
            phi_22 = jnp.expm1(-r2 * h) / (r2 * h) + 1.0
            phi_2 = phi_1 / h + 1.0
            phi_3 = phi_2 / h - 0.5
            if m_s1 is None:
                x_s1 = (bshape(sig["s1"] / sig["s"]) * x
                        - bshape(alpha_s1 * phi_11) * m_s)
                m_s1 = model_value(x_s1, s1)
            x_s2 = (bshape(sig["s2"] / sig["s"]) * x
                    - bshape(alpha_s2 * phi_12) * m_s
                    + (r2 / r1) * bshape(alpha_s2 * phi_22) * (m_s1 - m_s))
            m_s2 = model_value(x_s2, s2)
            if solver_type == "dpm_solver":
                x_t = (bshape(sig["t"] / sig["s"]) * x
                       - bshape(alpha_t * phi_1) * m_s
                       + (1.0 / r2) * bshape(alpha_t * phi_2) * (m_s2 - m_s))
            else:
                d1_0 = (1.0 / r1) * (m_s1 - m_s)
                d1_1 = (1.0 / r2) * (m_s2 - m_s)
                d1 = (r2 * d1_0 - r1 * d1_1) / (r2 - r1)
                d2 = 2.0 * (d1_1 - d1_0) / (r2 - r1)
                x_t = (bshape(sig["t"] / sig["s"]) * x
                       - bshape(alpha_t * phi_1) * m_s
                       + bshape(alpha_t * phi_2) * d1
                       - bshape(alpha_t * phi_3) * d2)
        else:
            phi_11, phi_12, phi_1 = (jnp.expm1(r1 * h), jnp.expm1(r2 * h),
                                     jnp.expm1(h))
            phi_22 = jnp.expm1(r2 * h) / (r2 * h) - 1.0
            phi_2 = phi_1 / h - 1.0
            phi_3 = phi_2 / h - 0.5
            if m_s1 is None:
                x_s1 = (bshape(jnp.exp(log_a["s1"] - log_a["s"])) * x
                        - bshape(sig["s1"] * phi_11) * m_s)
                m_s1 = model_value(x_s1, s1)
            x_s2 = (bshape(jnp.exp(log_a["s2"] - log_a["s"])) * x
                    - bshape(sig["s2"] * phi_12) * m_s
                    - (r2 / r1) * bshape(sig["s2"] * phi_22) * (m_s1 - m_s))
            m_s2 = model_value(x_s2, s2)
            if solver_type == "dpm_solver":
                x_t = (bshape(jnp.exp(log_a["t"] - log_a["s"])) * x
                       - bshape(sig["t"] * phi_1) * m_s
                       - (1.0 / r2) * bshape(sig["t"] * phi_2) * (m_s2 - m_s))
            else:
                d1_0 = (1.0 / r1) * (m_s1 - m_s)
                d1_1 = (1.0 / r2) * (m_s2 - m_s)
                d1 = (r2 * d1_0 - r1 * d1_1) / (r2 - r1)
                d2 = 2.0 * (d1_1 - d1_0) / (r2 - r1)
                x_t = (bshape(jnp.exp(log_a["t"] - log_a["s"])) * x
                       - bshape(sig["t"] * phi_1) * m_s
                       - bshape(sig["t"] * phi_2) * d1
                       - bshape(sig["t"] * phi_3) * d2)
        return x_t, m_s, m_s1

    return first, second, third


def _model_value_fn(model_fn, schedule, shape, predict_x0: bool):
    nd = len(shape) - 1

    def bshape(v):
        v = jnp.asarray(v)
        return v.reshape(v.shape + (1,) * nd)

    def model_value(x, t):
        t_model = schedule.model_input_time(t)
        eps = model_fn(x, jnp.broadcast_to(t_model, (shape[0],)))
        if predict_x0:
            return (x - bshape(schedule.marginal_std(t)) * eps) \
                / bshape(schedule.marginal_alpha(t))
        return eps

    return model_value


def dpm_solver_singlestep_loop(model_fn: Callable, shape,
                               schedule: DiscreteNoiseSchedule, *,
                               steps: int, order: int = 3, rng,
                               t_0: float = 1e-3, t_T: float = 1.0,
                               skip_type: str = "time_uniform",
                               predict_x0: bool = True,
                               solver_type: str = "dpm_solver",
                               noise: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Singlestep DPM-Solver-fast for a fixed NFE budget
    (dpm_solver.py:439-500 order schedule, :985-1056 'singlestep' branch).
    The order schedule is static, so the loop unrolls into one jittable
    graph; NFE == steps."""
    orders = singlestep_orders(steps, order)
    k = len(orders)
    if skip_type == "logSNR":
        lam_T = float(schedule.marginal_lambda(jnp.float32(t_T)))
        lam_0 = float(schedule.marginal_lambda(jnp.float32(t_0)))
        lams = jnp.linspace(lam_T, lam_0, k + 1)
        outer = schedule.inverse_lambda(lams)
    elif skip_type == "time_uniform":
        grid = jnp.linspace(t_T, t_0, steps + 1)
        outer = grid[jnp.cumsum(jnp.asarray([0] + orders))]
    elif skip_type == "time_quadratic":
        grid = jnp.linspace(t_T ** 0.5, t_0 ** 0.5, steps + 1) ** 2
        outer = grid[jnp.cumsum(jnp.asarray([0] + orders))]
    else:
        raise ValueError(f"unknown skip_type: {skip_type!r}")

    model_value = _model_value_fn(model_fn, schedule, shape, predict_x0)
    first, second, third = _make_singlestep_updates(
        schedule, model_value, len(shape) - 1, predict_x0, solver_type)

    def inner_grid(s, t, n):
        # get_time_steps over the inner interval (dpm_solver.py:1131-1137):
        # r1/r2 come from the inner grid's lambdas, not fixed fractions
        if skip_type == "logSNR":
            lams = jnp.linspace(schedule.marginal_lambda(s),
                                schedule.marginal_lambda(t), n + 1)
            return schedule.inverse_lambda(lams)
        if skip_type == "time_uniform":
            return jnp.linspace(s, t, n + 1)
        return jnp.linspace(jnp.sqrt(s), jnp.sqrt(t), n + 1) ** 2

    x = jax.random.normal(rng, shape) if noise is None else noise
    for i, o in enumerate(orders):
        s, t = outer[i], outer[i + 1]
        if o == 1:
            x, _ = first(x, s, t)
        else:
            lam = schedule.marginal_lambda(inner_grid(s, t, o))
            h = lam[-1] - lam[0]
            r1 = (lam[1] - lam[0]) / h
            if o == 2:
                x, _, _ = second(x, s, t, r1=r1)
            else:
                x, _, _ = third(x, s, t, r1=r1, r2=(lam[2] - lam[0]) / h)
    return x


def dpm_solver_adaptive_loop(model_fn: Callable, shape,
                             schedule: DiscreteNoiseSchedule, *, rng,
                             order: int = 3,
                             t_0: float = 1e-3, t_T: float = 1.0,
                             h_init: float = 0.05, atol: float = 0.0078,
                             rtol: float = 0.05, theta: float = 0.9,
                             t_err: float = 1e-5,
                             predict_x0: bool = True,
                             solver_type: str = "dpm_solver",
                             max_iters: int = 200,
                             noise: Optional[jnp.ndarray] = None):
    """Adaptive step-size DPM-Solver (dpm_solver.py:909-963): embedded
    lower/higher-order pair, accept when the scaled error E <= 1, logSNR
    step h <- min(theta*h*E^(-1/order), lambda_0 - lambda_s). The
    data-dependent loop is a lax.while_loop (jit-compatible; max_iters
    bounds runaway schedules). Returns (x, nfe)."""
    assert order in (2, 3), "adaptive solver supports order 2 or 3"
    model_value = _model_value_fn(model_fn, schedule, shape, predict_x0)
    first, second, third = _make_singlestep_updates(
        schedule, model_value, len(shape) - 1, predict_x0, solver_type)

    if order == 2:
        def lower(x, s, t):
            x_l, m_s = first(x, s, t)
            return x_l, (m_s,)

        def higher(x, s, t, inter):
            return second(x, s, t, r1=0.5, m_s=inter[0])[0]
    else:
        def lower(x, s, t):
            x_l, m_s, m_s1 = second(x, s, t, r1=1.0 / 3.0)
            return x_l, (m_s, m_s1)

        def higher(x, s, t, inter):
            return third(x, s, t, r1=1.0 / 3.0, r2=2.0 / 3.0,
                         m_s=inter[0], m_s1=inter[1])[0]

    lam_0 = schedule.marginal_lambda(jnp.float32(t_0))
    x_T = jax.random.normal(rng, shape) if noise is None else noise

    def cond(carry):
        x, x_prev, s, h, nfe, it = carry
        return jnp.logical_and(jnp.abs(s - t_0) > t_err, it < max_iters)

    def body(carry):
        x, x_prev, s, h, nfe, it = carry
        lam_s = schedule.marginal_lambda(s)
        t = schedule.inverse_lambda(lam_s + h)
        x_lower, inter = lower(x, s, t)
        x_higher = higher(x, s, t, inter)
        delta = jnp.maximum(atol, rtol * jnp.maximum(jnp.abs(x_lower),
                                                     jnp.abs(x_prev)))
        err = ((x_higher - x_lower) / delta) ** 2
        e = jnp.sqrt(err.reshape(shape[0], -1).mean(axis=-1)).max()
        accept = e <= 1.0
        x_new = jnp.where(accept, x_higher, x)
        x_prev_new = jnp.where(accept, x_lower, x_prev)
        s_new = jnp.where(accept, t, s)
        lam_new = schedule.marginal_lambda(s_new)
        h_new = jnp.minimum(theta * h * e ** (-1.0 / order), lam_0 - lam_new)
        return (x_new, x_prev_new, s_new, h_new, nfe + order, it + 1)

    x, _, _, _, nfe, _ = jax.lax.while_loop(
        cond, body, (x_T, x_T, jnp.float32(t_T), jnp.float32(h_init),
                     jnp.int32(0), jnp.int32(0)))
    return x, nfe


def dpm_model_wrapper(raw_model: Callable, schedule: DiscreteNoiseSchedule, *,
                      model_type: str = "noise",
                      guidance_type: str = "uncond",
                      guidance_scale: float = 1.0,
                      classifier_fn: Optional[Callable] = None,
                      condition=None, uncond_condition=None) -> Callable:
    """Build the eps-prediction model_fn(x, t_model) the solver loops expect,
    covering the reference model_wrapper variants (dpm_solver.py:177-348):

    model_type: 'noise' | 'x_start' | 'v' | 'score' — output parameterization
        converted to eps via the marginal alpha/sigma at t.
    guidance_type:
        'uncond'          — raw_model(x, t_model)
        'classifier'      — eps - scale * sigma_t * grad_x log p(cond|x)
                            (classifier_fn(x, t_model, cond) -> log prob [B])
        'classifier-free' — 2x-batch CFG over (uncond_condition, condition);
                            raw_model(x, t_model, c) conditional signature.
    """
    assert model_type in ("noise", "x_start", "v", "score"), model_type
    assert guidance_type in ("uncond", "classifier", "classifier-free"), \
        guidance_type
    n = schedule.t_array.shape[-1]

    def t_cont_of(t_model):
        return t_model / n + 1.0 / n    # inverse of model_input_time

    def bshape(v, x):
        v = jnp.asarray(v)
        return v.reshape(v.shape + (1,) * (x.ndim - 1))

    def to_eps(out, x, t_model):
        if model_type == "noise":
            return out
        # per-sample times: batch-folded candidates give every sample its
        # own t (fitness.py), so alpha/sigma must be [B], not t_model[0]'s
        t = t_cont_of(t_model)
        alpha = schedule.marginal_alpha(t)
        sigma = schedule.marginal_std(t)
        if model_type == "x_start":
            return (x - bshape(alpha, x) * out) / bshape(sigma, x)
        if model_type == "v":
            return bshape(alpha, x) * out + bshape(sigma, x) * x
        return -bshape(sigma, x) * out          # score

    def noise_pred(x, t_model, cond=None):
        out = raw_model(x, t_model) if cond is None else \
            raw_model(x, t_model, cond)
        return to_eps(out, x, t_model)

    if guidance_type == "uncond":
        return noise_pred

    if guidance_type == "classifier":
        assert classifier_fn is not None

        def guided(x, t_model):
            grad = jax.grad(
                lambda xx: classifier_fn(xx, t_model, condition).sum())(x)
            sigma = schedule.marginal_std(t_cont_of(t_model))
            return noise_pred(x, t_model) - guidance_scale * \
                bshape(sigma, x) * grad

        return guided

    def cfg(x, t_model):
        if guidance_scale == 1.0 or uncond_condition is None:
            return noise_pred(x, t_model, condition)
        x2 = jnp.concatenate([x, x], axis=0)
        t2 = jnp.concatenate([t_model, t_model], axis=0)
        c2 = jax.tree_util.tree_map(
            lambda u, c: jnp.concatenate([u, c], axis=0),
            uncond_condition, condition)
        eps = noise_pred(x2, t2, c2)
        e_u, e_c = eps[: x.shape[0]], eps[x.shape[0]:]
        return e_u + guidance_scale * (e_c - e_u)

    return cfg
