"""SD-side samplers: DDIM (CompVis tables), PLMS, DPM-Solver++ parity."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autodiffusion_tpu.samplers import (DiscreteNoiseSchedule, ModelMeanType,
                                        ModelVarType, ddim_sample_loop,
                                        dpm_solver_sample_loop,
                                        dpm_solver_times, plms_sample_loop)
from autodiffusion_tpu.schedules import build_sd_tables, make_beta_schedule

pytestmark = pytest.mark.slow

SD_REF = "/root/reference/examples/Stable Diffusion"


@pytest.fixture(scope="module")
def sd_ref():
    import os
    if not os.path.isdir(SD_REF):
        pytest.skip("SD reference not available")
    if SD_REF not in sys.path:
        sys.path.insert(0, SD_REF)
    try:
        import torch  # noqa: F401
        from ldm.models.diffusion import plms  # noqa: F401
    except Exception as e:
        pytest.skip(f"SD reference import failed: {e}")
    return SD_REF


def _eps_np(x, t, T=1000):
    """Analytic eps 'model' (NCHW numpy semantics)."""
    return np.tanh(x) * 0.3 + (np.asarray(t, np.float32) / T).reshape(-1, 1, 1, 1) * 0.1


def _eps_jnp(x, t, T=1000):
    """Same analytic model in jnp (elementwise -> layout-agnostic)."""
    return jnp.tanh(x) * 0.3 + (t.astype(jnp.float32) / T).reshape(-1, 1, 1, 1) * 0.1


class _StubLDM:
    """Minimal CompVis-model stand-in for the reference samplers."""

    def __init__(self, betas):
        import torch
        abar = np.cumprod(1 - betas)
        self.betas = torch.from_numpy(betas.astype(np.float32))
        self.alphas_cumprod = torch.from_numpy(abar.astype(np.float32))
        self.alphas_cumprod_prev = torch.from_numpy(
            np.append(1.0, abar[:-1]).astype(np.float32))
        self.num_timesteps = len(betas)
        self.device = torch.device("cpu")
        self.parameterization = "eps"

    def apply_model(self, x, t, c):
        import torch
        return torch.from_numpy(_eps_np(x.numpy(), t.numpy()))


def _no_cuda_register_buffer(self, name, attr):
    setattr(self, name, attr)


@pytest.fixture
def no_cuda_buffers(sd_ref):
    """Patch the reference samplers' register_buffer (their version calls
    .cuda()) for ONE test, restoring the originals afterwards so later
    reference uses in the session see the true semantics."""
    from ldm.models.diffusion.ddim import DDIMSampler
    from ldm.models.diffusion.plms import PLMSSampler
    saved = (DDIMSampler.register_buffer, PLMSSampler.register_buffer)
    DDIMSampler.register_buffer = _no_cuda_register_buffer
    PLMSSampler.register_buffer = _no_cuda_register_buffer
    yield
    DDIMSampler.register_buffer = saved[0]
    PLMSSampler.register_buffer = saved[1]


SPEC = [94, 217, 354, 574, 834, 944]


class TestSDDdimParity:
    def test_ddim_matches_compvis(self, sd_ref, no_cuda_buffers):
        import torch
        from ldm.models.diffusion.ddim import DDIMSampler

        betas = make_beta_schedule("sqrt_linear", 1000)
        stub = _StubLDM(betas)
        sampler = DDIMSampler(stub)
        x_T = np.random.RandomState(0).randn(2, 3, 8, 8).astype(np.float32)
        with torch.no_grad():
            want, _ = sampler.sample(
                S=len(SPEC), batch_size=2, shape=(3, 8, 8), verbose=False,
                x_T=torch.from_numpy(x_T), sampled_timestep=np.array(SPEC),
                eta=0.0)
        want = want.numpy()

        tables = build_sd_tables(SPEC)

        def model_fn(x, t, i):
            return _eps_jnp(x, t)

        got = ddim_sample_loop(
            model_fn, (2, 8, 8, 3), tables, rng=jax.random.key(0),
            clip_denoised=False, var_type=ModelVarType.FIXED_SMALL,
            noise=jnp.asarray(x_T.transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                                   atol=2e-4, rtol=2e-4)


class TestPLMSParity:
    def test_plms_matches_compvis(self, sd_ref, no_cuda_buffers):
        import torch
        from ldm.models.diffusion.plms import PLMSSampler

        betas = make_beta_schedule("sqrt_linear", 1000)
        stub = _StubLDM(betas)
        sampler = PLMSSampler(stub)
        x_T = np.random.RandomState(1).randn(2, 3, 8, 8).astype(np.float32)
        with torch.no_grad():
            want, _ = sampler.sample(
                S=len(SPEC), batch_size=2, shape=(3, 8, 8), verbose=False,
                x_T=torch.from_numpy(x_T), sampled_timestep=np.array(SPEC),
                eta=0.0)
        want = want.numpy()

        tables = build_sd_tables(SPEC)

        def model_fn(x, t, i):
            return _eps_jnp(x, t)

        got = plms_sample_loop(model_fn, (2, 8, 8, 3), tables,
                               rng=jax.random.key(0),
                               noise=jnp.asarray(x_T.transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                                   atol=5e-4, rtol=5e-4)


class TestDPMSolverParity:
    # NB: order-3 + lower_order_final crashes in the reference itself (its
    # second_update unpacks a 2-list but receives 3,
    # dpm_solver.py:773) — the searched config is order 2; order 3 is
    # tested without the final-step taper.
    @pytest.mark.parametrize("order,K,lof", [(1, 4, True), (2, 4, True),
                                             (2, 7, True), (3, 6, False)])
    def test_multistep_matches_reference(self, sd_ref, order, K, lof):
        import torch
        from ldm.models.diffusion.dpm_solver.dpm_solver import (DPM_Solver,
                                                                NoiseScheduleVP,
                                                                model_wrapper)
        betas = make_beta_schedule("sqrt_linear", 1000)
        abar = np.cumprod(1 - betas)
        ns = NoiseScheduleVP("discrete",
                             alphas_cumprod=torch.from_numpy(abar.astype(np.float32)))

        def torch_model(x, t_cont):
            return torch.from_numpy(_eps_np(x.numpy(), t_cont.numpy()))

        wrapped = model_wrapper(torch_model, ns, model_type="noise")
        solver = DPM_Solver(wrapped, ns, predict_x0=True, thresholding=False)
        x_T = np.random.RandomState(2).randn(2, 3, 8, 8).astype(np.float32)
        with torch.no_grad():
            want = solver.sample(torch.from_numpy(x_T), steps=K,
                                 skip_type="time_uniform", method="multistep",
                                 order=order, lower_order_final=lof).numpy()

        sched = DiscreteNoiseSchedule.from_alphas_cumprod(abar)
        times = jnp.asarray(dpm_solver_times(K), jnp.float32)

        def model_fn(x, t_model):
            return _eps_jnp(x, t_model)

        got = dpm_solver_sample_loop(
            model_fn, (2, 8, 8, 3), sched, times, rng=jax.random.key(0),
            order=order, lower_order_final=lof, predict_x0=True,
            noise=jnp.asarray(x_T.transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                                   atol=5e-4, rtol=5e-4)

    def test_searched_times_same_compiled_fn(self):
        """Different candidate time vectors reuse one jitted solver."""
        betas = make_beta_schedule("sqrt_linear", 1000)
        sched = DiscreteNoiseSchedule.from_betas(betas)

        def model_fn(x, t_model):
            return 0.1 * x + 0.01 * t_model.reshape(-1, 1, 1, 1)

        f = jax.jit(lambda times, rng: dpm_solver_sample_loop(
            model_fn, (2, 8, 8, 3), sched, times, rng=rng))
        t1 = jnp.asarray(dpm_solver_times(4), jnp.float32)
        t2 = jnp.asarray(sorted([0.014986, 0.285715, 0.5005, 0.718282, 0.926074],
                                reverse=True), jnp.float32)
        a = f(t1, jax.random.key(0))
        b = f(t2, jax.random.key(0))
        assert np.isfinite(np.asarray(a)).all() and np.isfinite(np.asarray(b)).all()
        assert np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-6


class TestStochasticEncodeIndex:
    """img2img noising must gather the ddim alpha at index t_enc — one level
    deeper than the last decoded step (ddim.py:220-233 stochastic_encode,
    img2img.py:240-261) — not t_enc-1."""

    def test_q_sample_matches_reference_stochastic_encode(self, sd_ref):
        from ldm.modules.diffusionmodules.util import (
            make_ddim_sampling_parameters, make_ddim_timesteps)

        from autodiffusion_tpu.samplers import q_sample
        from autodiffusion_tpu.schedules import build_sd_tables

        S, strength = 10, 0.53
        t_enc = max(1, int(strength * S))                   # img2img.py:240
        steps = make_ddim_timesteps("uniform", S, 1000, verbose=False)
        betas = make_beta_schedule("sqrt_linear", 1000)
        abar = np.cumprod(1.0 - betas)
        _, ddim_alphas, _ = make_ddim_sampling_parameters(
            alphacums=abar, ddim_timesteps=steps, eta=0.0, verbose=False)

        rng = np.random.RandomState(0)
        z0 = rng.randn(2, 4, 4, 3).astype(np.float32)
        noise = rng.randn(2, 4, 4, 3).astype(np.float32)
        # reference stochastic_encode at t = t_enc (ddim.py:232-233)
        a = ddim_alphas[t_enc]
        want = np.sqrt(a) * z0 + np.sqrt(1.0 - a) * noise

        tables = build_sd_tables(steps)
        enc_idx = min(t_enc, tables.num_steps - 1)          # cli/main.py
        got = q_sample(tables, jnp.asarray(z0),
                       jnp.full((2,), enc_idx), jnp.asarray(noise))
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5, rtol=1e-5)


class TestDPMSolverSinglestepAdaptive:
    """Parity vs the reference singlestep/adaptive DPM-Solver modes
    (dpm_solver.py:439-500,516-733 singlestep; :909-963 adaptive)."""

    def _setup(self, sd_ref, monkeypatch=None):
        import sys
        import torch
        from ldm.models.diffusion.dpm_solver.dpm_solver import (DPM_Solver,
                                                                NoiseScheduleVP,
                                                                model_wrapper)

        # the reference calls torch.cumsum without dim
        # (dpm_solver.py:495), which modern torch rejects; shim it
        if monkeypatch is not None:
            orig_cumsum = torch.cumsum
            monkeypatch.setattr(
                torch, "cumsum",
                lambda t, dim=0, **kw: orig_cumsum(t, dim, **kw))

        betas = make_beta_schedule("sqrt_linear", 1000)
        abar = np.cumprod(1.0 - betas)
        ns_ref = NoiseScheduleVP(
            "discrete",
            alphas_cumprod=torch.from_numpy(abar.astype(np.float32)))
        sched = DiscreteNoiseSchedule.from_betas(betas)
        rng = np.random.RandomState(0)
        x0 = rng.randn(2, 3, 8, 8).astype(np.float32)

        def raw_torch(x, t_input):
            t = np.asarray(t_input, np.float32).reshape(-1, 1, 1, 1)
            import torch as th
            return th.tanh(x) * 0.3 + th.from_numpy(t) / 1000.0 * 0.1

        # DPM_Solver expects the model_wrapper-wrapped fn over continuous t
        model_torch = model_wrapper(raw_torch, ns_ref, model_type="noise")

        def model_jnp(x, t_input):
            # NHWC layout; elementwise analytic model is layout-agnostic
            return (jnp.tanh(x) * 0.3
                    + (t_input.astype(jnp.float32) / 1000.0 * 0.1
                       ).reshape(-1, 1, 1, 1))

        return ns_ref, DPM_Solver, sched, x0, model_torch, model_jnp

    @pytest.mark.parametrize("steps,order", [(5, 2), (6, 3), (7, 3), (4, 1)])
    def test_singlestep_matches_reference(self, sd_ref, steps, order,
                                          monkeypatch):
        import torch
        ns_ref, DPM_Solver, sched, x0, model_torch, model_jnp = \
            self._setup(sd_ref, monkeypatch)
        solver = DPM_Solver(model_torch, ns_ref, predict_x0=True)
        with torch.no_grad():
            want = solver.sample(torch.from_numpy(x0.copy()), steps=steps,
                                 order=order, skip_type="time_uniform",
                                 method="singlestep",
                                 lower_order_final=True).numpy()
        from autodiffusion_tpu.samplers import dpm_solver_singlestep_loop
        got = dpm_solver_singlestep_loop(
            model_jnp, (2, 8, 8, 3), sched, steps=steps, order=order,
            rng=jax.random.key(0),
            noise=jnp.asarray(x0.transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2),
                                   want, atol=5e-4, rtol=5e-4)

    @pytest.mark.parametrize("order", [2, 3])
    def test_adaptive_matches_reference(self, sd_ref, order):
        import torch
        ns_ref, DPM_Solver, sched, x0, model_torch, model_jnp = \
            self._setup(sd_ref)
        solver = DPM_Solver(model_torch, ns_ref, predict_x0=True)
        with torch.no_grad():
            want = solver.sample(torch.from_numpy(x0.copy()), order=order,
                                 method="adaptive", atol=0.0078,
                                 rtol=0.05).numpy()
        from autodiffusion_tpu.samplers import dpm_solver_adaptive_loop
        got, nfe = dpm_solver_adaptive_loop(
            model_jnp, (2, 8, 8, 3), sched, order=order,
            rng=jax.random.key(0),
            noise=jnp.asarray(x0.transpose(0, 2, 3, 1)))
        assert int(nfe) > 0
        np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2),
                                   want, atol=2e-3, rtol=2e-3)

    def test_order_schedule_matches_reference(self, sd_ref):
        import sys
        from autodiffusion_tpu.samplers import singlestep_orders
        for steps in range(1, 16):
            for order in (1, 2, 3):
                if order == 3:
                    k = steps // 3 + 1
                    want = ([3] * (k - 2) + [2, 1] if steps % 3 == 0 else
                            [3] * (k - 1) + [1] if steps % 3 == 1 else
                            [3] * (k - 1) + [2])
                elif order == 2:
                    want = ([2] * (steps // 2) if steps % 2 == 0
                            else [2] * (steps // 2) + [1])
                else:
                    want = [1] * steps
                got = singlestep_orders(steps, order)
                assert got == want and sum(got) == steps, (steps, order, got)


class TestDPMModelWrapper:
    """dpm_model_wrapper vs the reference model_wrapper variants
    (dpm_solver.py:177-348): model_type conversions and guidance types."""

    def _setup(self, sd_ref):
        import sys
        import torch
        from ldm.models.diffusion.dpm_solver.dpm_solver import (NoiseScheduleVP,
                                                                model_wrapper)
        betas = make_beta_schedule("sqrt_linear", 1000)
        abar = np.cumprod(1.0 - betas)
        ns = NoiseScheduleVP(
            "discrete", alphas_cumprod=torch.from_numpy(abar.astype(np.float32)))
        from autodiffusion_tpu.samplers import DiscreteNoiseSchedule
        sched = DiscreteNoiseSchedule.from_betas(betas)
        rng = np.random.RandomState(0)
        x = rng.randn(2, 3, 4, 4).astype(np.float32)
        t_cont = np.array([0.4, 0.4], np.float32)
        return ns, model_wrapper, sched, x, t_cont

    @pytest.mark.parametrize("model_type", ["noise", "x_start", "v"])
    def test_model_type_conversions(self, sd_ref, model_type):
        import torch
        ns, model_wrapper, sched, x, t_cont = self._setup(sd_ref)

        def raw_torch(x, t_input):
            t = np.asarray(t_input, np.float32).reshape(-1, 1, 1, 1)
            return torch.tanh(x) * 0.5 + torch.from_numpy(t) / 1000.0

        wrapped = model_wrapper(raw_torch, ns, model_type=model_type)
        with torch.no_grad():
            want = wrapped(torch.from_numpy(x.copy()),
                           torch.from_numpy(t_cont)).numpy()

        from autodiffusion_tpu.samplers import dpm_model_wrapper
        raw_jnp = lambda x, t: (jnp.tanh(x) * 0.5
                                + (t.astype(jnp.float32) / 1000.0
                                   ).reshape(-1, 1, 1, 1))
        ours = dpm_model_wrapper(raw_jnp, sched, model_type=model_type)
        t_model = np.asarray(sched.model_input_time(jnp.asarray(t_cont)))
        got = ours(jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(t_model))
        np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2),
                                   want, atol=2e-4, rtol=2e-4)

    @pytest.mark.parametrize("model_type", ["x_start", "v", "score"])
    def test_per_sample_times(self, sd_ref, model_type):
        """Batch-folded candidates give every sample its own time; the
        eps conversion must use per-sample alpha/sigma, not t_model[0]'s
        (regression: candidates 1..C-1 silently used candidate 0's)."""
        ns, model_wrapper, sched, x, _ = self._setup(sd_ref)
        from autodiffusion_tpu.samplers import dpm_model_wrapper

        raw_jnp = lambda x, t: (jnp.tanh(x) * 0.5
                                + (t.astype(jnp.float32) / 1000.0
                                   ).reshape(-1, 1, 1, 1))
        ours = dpm_model_wrapper(raw_jnp, sched, model_type=model_type)
        xj = jnp.asarray(x.transpose(0, 2, 3, 1))
        t_cont = np.array([0.2, 0.8], np.float32)   # two folded candidates
        t_model = np.asarray(sched.model_input_time(jnp.asarray(t_cont)))
        batched = ours(xj, jnp.asarray(t_model))
        # each sample must equal its OWN single-time evaluation
        for i in range(2):
            solo = ours(xj[i:i + 1], jnp.asarray(t_model[i:i + 1]))
            np.testing.assert_allclose(np.asarray(batched[i]),
                                       np.asarray(solo[0]),
                                       atol=1e-5, rtol=1e-5)

    def test_classifier_guidance(self, sd_ref):
        import torch
        ns, model_wrapper, sched, x, t_cont = self._setup(sd_ref)

        def raw_torch(x, t_input):
            return torch.tanh(x) * 0.5

        def clf_torch(x, t_input, cond, **kw):
            return -(x ** 2).reshape(x.shape[0], -1).sum(-1) * 0.01

        wrapped = model_wrapper(
            raw_torch, ns, model_type="noise", guidance_type="classifier",
            classifier_fn=clf_torch, guidance_scale=2.0, condition=None,
            classifier_kwargs={})
        want = wrapped(torch.from_numpy(x.copy()),
                       torch.from_numpy(t_cont)).numpy()

        from autodiffusion_tpu.samplers import dpm_model_wrapper
        ours = dpm_model_wrapper(
            lambda x, t: jnp.tanh(x) * 0.5, sched, model_type="noise",
            guidance_type="classifier", guidance_scale=2.0,
            classifier_fn=lambda x, t, c: -(x ** 2).reshape(x.shape[0], -1
                                                            ).sum(-1) * 0.01)
        t_model = np.asarray(sched.model_input_time(jnp.asarray(t_cont)))
        got = ours(jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(t_model))
        np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2),
                                   want, atol=2e-4, rtol=2e-4)

    def test_classifier_free_guidance(self, sd_ref):
        import torch
        ns, model_wrapper, sched, x, t_cont = self._setup(sd_ref)
        cond = np.full((2, 4), 0.7, np.float32)
        uncond = np.zeros((2, 4), np.float32)

        def raw_torch(x, t_input, c):
            return torch.tanh(x) * 0.5 + c.mean(-1).reshape(-1, 1, 1, 1)

        wrapped = model_wrapper(
            raw_torch, ns, model_type="noise", guidance_type="classifier-free",
            guidance_scale=3.5, condition=torch.from_numpy(cond),
            unconditional_condition=torch.from_numpy(uncond))
        with torch.no_grad():
            want = wrapped(torch.from_numpy(x.copy()),
                           torch.from_numpy(t_cont)).numpy()

        from autodiffusion_tpu.samplers import dpm_model_wrapper
        ours = dpm_model_wrapper(
            lambda x, t, c: jnp.tanh(x) * 0.5 + c.mean(-1).reshape(-1, 1, 1, 1),
            sched, model_type="noise", guidance_type="classifier-free",
            guidance_scale=3.5, condition=jnp.asarray(cond),
            uncond_condition=jnp.asarray(uncond))
        t_model = np.asarray(sched.model_input_time(jnp.asarray(t_cont)))
        got = ours(jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(t_model))
        np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2),
                                   want, atol=2e-4, rtol=2e-4)
