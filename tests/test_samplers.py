"""Sampler parity vs the reference GaussianDiffusion, plus vmap/jit behavior."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autodiffusion_tpu.models import EncoderUNetModel, UNetModel
from autodiffusion_tpu.models.convert import convert_classifier, convert_unet
from autodiffusion_tpu.samplers import (ModelMeanType, ModelVarType,
                                        classifier_cond_fn, ddim_sample_loop,
                                        p_mean_variance, p_sample_loop, q_sample)
from autodiffusion_tpu.schedules import build_tables, stack_tables

pytestmark = pytest.mark.slow

SPEC6 = [94, 834, 217, 944, 574, 354]


def ref_spaced(reference_gd, spec, schedule="cosine", learn_sigma=True):
    from guided_diffusion import gaussian_diffusion as rgd
    from guided_diffusion import respace as rrs
    use = rrs.space_timesteps(1000, spec) if isinstance(spec, str) else set(spec)
    return rrs.SpacedDiffusion(
        use_timesteps=use,
        betas=rgd.get_named_beta_schedule(schedule, 1000),
        model_mean_type=rgd.ModelMeanType.EPSILON,
        model_var_type=(rgd.ModelVarType.LEARNED_RANGE if learn_sigma
                        else rgd.ModelVarType.FIXED_SMALL),
        loss_type=rgd.LossType.MSE,
    )


class TestMathParity:
    @pytest.mark.parametrize("vt", ["LEARNED_RANGE", "FIXED_SMALL", "FIXED_LARGE"])
    def test_p_mean_variance(self, reference_gd, vt):
        import torch
        from guided_diffusion import gaussian_diffusion as rgd
        from guided_diffusion import respace as rrs
        rng = np.random.RandomState(0)
        learned = vt.startswith("LEARNED")
        x = rng.randn(2, 3, 8, 8).astype(np.float32)
        out = rng.randn(2, 6 if learned else 3, 8, 8).astype(np.float32) * 0.1
        ref = rrs.SpacedDiffusion(
            use_timesteps=set(SPEC6),
            betas=rgd.get_named_beta_schedule("cosine", 1000),
            model_mean_type=rgd.ModelMeanType.EPSILON,
            model_var_type=getattr(rgd.ModelVarType, vt),
            loss_type=rgd.LossType.MSE)
        i = 3
        rout = ref.p_mean_variance(
            lambda x_, t_, **kw: torch.from_numpy(out),
            torch.from_numpy(x), torch.tensor([i, i]), clip_denoised=True)
        tables = build_tables(SPEC6, base_schedule="cosine")
        mean, var, logvar, x0 = p_mean_variance(
            tables, jnp.asarray(out.transpose(0, 2, 3, 1)),
            jnp.asarray(x.transpose(0, 2, 3, 1)), i,
            mean_type=ModelMeanType.EPSILON,
            var_type=getattr(ModelVarType, vt), clip_denoised=True)
        for ours, key in [(mean, "mean"), (logvar, "log_variance"),
                          (x0, "pred_xstart")]:
            want = rout[key].numpy()
            got = np.asarray(jnp.broadcast_to(ours, (2, 8, 8, x.shape[1]))
                             ).transpose(0, 3, 1, 2)
            np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5,
                                       err_msg=f"{vt}:{key}")

    def test_q_sample(self, reference_gd):
        import torch
        rng = np.random.RandomState(1)
        x0 = rng.randn(2, 3, 8, 8).astype(np.float32)
        noise = rng.randn(2, 3, 8, 8).astype(np.float32)
        ref = ref_spaced(None, SPEC6)
        want = ref.q_sample(torch.from_numpy(x0), torch.tensor([2, 4]),
                            torch.from_numpy(noise)).numpy()
        tables = build_tables(SPEC6, base_schedule="cosine")
        got = q_sample(tables, jnp.asarray(x0.transpose(0, 2, 3, 1)),
                       jnp.array([2, 4]), jnp.asarray(noise.transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                                   atol=1e-5, rtol=1e-5)


@pytest.fixture(scope="module")
def tiny_pair(request):
    """Tiny learn-sigma class-cond UNet in torch + converted flax params."""
    request.getfixturevalue("reference_gd")
    import torch
    from guided_diffusion.unet import UNetModel as TorchUNet
    torch.manual_seed(0)
    tm = TorchUNet(image_size=16, in_channels=3, model_channels=32,
                   out_channels=6, num_res_blocks=1, attention_resolutions=(2,),
                   dropout=0.0, channel_mult=(1, 2), num_classes=10,
                   use_checkpoint=False, use_fp16=False, num_heads=1,
                   num_head_channels=32, num_heads_upsample=-1,
                   use_scale_shift_norm=True, resblock_updown=True,
                   use_new_attention_order=True)
    tm.eval()
    fm = UNetModel(model_channels=32, out_channels=6, num_res_blocks=1,
                   attention_ds=(2,), channel_mult=(1, 2), num_head_channels=32,
                   num_classes=10, resblock_updown=True,
                   use_new_attention_order=True)
    params = convert_unet({k: v.detach().numpy() for k, v in tm.state_dict().items()}, fm)
    return tm, fm, params


class TestDdimLoopParity:
    @pytest.mark.parametrize("spec", ["ddim4", SPEC6])
    def test_uncond_matches_reference(self, reference_gd, tiny_pair, spec):
        import torch
        tm, fm, params = tiny_pair
        ref_diff = ref_spaced(None, spec)
        noise = np.random.RandomState(5).randn(2, 3, 16, 16).astype(np.float32)
        y = np.array([1, 7])
        with torch.no_grad():
            want = ref_diff.ddim_sample_loop(
                tm, (2, 3, 16, 16), noise=torch.from_numpy(noise),
                clip_denoised=True, model_kwargs={"y": torch.from_numpy(y)},
                eta=0.0, device="cpu").numpy()

        tables = build_tables(spec, base_schedule="cosine")
        yj = jnp.asarray(y)

        def model_fn(x, t, i):
            return fm.apply(params, x, t, yj)

        got = ddim_sample_loop(model_fn, (2, 16, 16, 3), tables,
                               rng=jax.random.key(0),
                               noise=jnp.asarray(noise.transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                                   atol=5e-4, rtol=5e-4)

    def test_classifier_guided_matches_reference(self, reference_gd, tiny_pair):
        import torch
        import torch.nn.functional as F
        from guided_diffusion.unet import EncoderUNetModel as TorchEnc
        tm, fm, params = tiny_pair
        torch.manual_seed(9)
        tc = TorchEnc(image_size=16, in_channels=3, model_channels=32,
                      out_channels=10, num_res_blocks=1,
                      attention_resolutions=(2,), channel_mult=(1, 2),
                      use_fp16=False, num_head_channels=32,
                      use_scale_shift_norm=True, resblock_updown=True,
                      pool="attention")
        tc.eval()
        fc = EncoderUNetModel(model_channels=32, out_channels=10,
                              num_res_blocks=1, attention_ds=(2,),
                              channel_mult=(1, 2), num_head_channels=32,
                              use_scale_shift_norm=True, resblock_updown=True,
                              use_new_attention_order=False, pool="attention")
        cparams = convert_classifier(
            {k: v.detach().numpy() for k, v in tc.state_dict().items()}, fc)

        scale = 2.5
        y = np.array([3, 8])

        def torch_cond_fn(x, t, y=None):
            with torch.enable_grad():
                x_in = x.detach().requires_grad_(True)
                logits = tc(x_in, t)
                log_probs = F.log_softmax(logits, dim=-1)
                selected = log_probs[range(len(logits)), y.view(-1)]
                return torch.autograd.grad(selected.sum(), x_in)[0] * scale

        ref_diff = ref_spaced(None, SPEC6)
        noise = np.random.RandomState(6).randn(2, 3, 16, 16).astype(np.float32)
        want = ref_diff.ddim_sample_loop(
            tm, (2, 3, 16, 16), noise=torch.from_numpy(noise),
            clip_denoised=True, model_kwargs={"y": torch.from_numpy(y)},
            cond_fn=torch_cond_fn, eta=0.0, device="cpu").numpy()

        tables = build_tables(SPEC6, base_schedule="cosine")
        yj = jnp.asarray(y)
        cond = classifier_cond_fn(lambda x, t: fc.apply(cparams, x, t), yj, scale)

        def model_fn(x, t, i):
            return fm.apply(params, x, t, yj)

        got = ddim_sample_loop(model_fn, (2, 16, 16, 3), tables,
                               rng=jax.random.key(0), cond_fn=cond,
                               noise=jnp.asarray(noise.transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                                   atol=1e-3, rtol=1e-3)


class TestLoopsJax:
    def _model(self):
        m = UNetModel(model_channels=32, out_channels=6, num_res_blocks=1,
                      attention_ds=(2,), channel_mult=(1, 2), num_head_channels=32)
        x = jnp.zeros((2, 16, 16, 3))
        params = m.init(jax.random.key(0), x, jnp.array([0.0, 1.0]))
        return m, params

    def test_ancestral_deterministic_given_rng(self):
        m, params = self._model()
        tables = build_tables("ddim4", base_schedule="cosine")

        def model_fn(x, t, i):
            return m.apply(params, x, t)

        a = p_sample_loop(model_fn, (2, 16, 16, 3), tables, rng=jax.random.key(3))
        b = p_sample_loop(model_fn, (2, 16, 16, 3), tables, rng=jax.random.key(3))
        c = p_sample_loop(model_fn, (2, 16, 16, 3), tables, rng=jax.random.key(4))
        assert a.shape == (2, 16, 16, 3)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert np.abs(np.asarray(a) - np.asarray(c)).max() > 1e-4

    def test_vmap_over_candidates(self):
        """Evaluating N candidates = vmap over stacked tables — the TPU-native
        replacement for the reference's serial per-candidate loop."""
        m, params = self._model()
        cands = [[0, 250, 500, 750], [10, 300, 600, 900], [5, 100, 200, 999]]
        stacked = stack_tables([build_tables(c, base_schedule="cosine")
                                for c in cands])

        def model_fn(x, t, i):
            return m.apply(params, x, t)

        def sample_one(tables):
            return ddim_sample_loop(model_fn, (2, 16, 16, 3), tables,
                                    rng=jax.random.key(0),
                                    noise=jnp.ones((2, 16, 16, 3)))

        batched = jax.vmap(sample_one)(stacked)
        assert batched.shape == (3, 2, 16, 16, 3)
        single = sample_one(jax.tree_util.tree_map(lambda a: a[1], stacked))
        np.testing.assert_allclose(np.asarray(batched[1]), np.asarray(single),
                                   atol=1e-5)


class TestConditionMeanParity:
    def test_ancestral_guidance_mean_shift(self, reference_gd):
        """condition_mean (Sohl-Dickstein guidance for ancestral sampling):
        mean' = mean + variance * grad (gaussian_diffusion.py:356-369)."""
        import torch
        from guided_diffusion import gaussian_diffusion as rgd
        from guided_diffusion import respace as rrs

        rng = np.random.RandomState(0)
        x = rng.randn(2, 3, 8, 8).astype(np.float32)
        out = rng.randn(2, 6, 8, 8).astype(np.float32) * 0.1
        grad = rng.randn(2, 3, 8, 8).astype(np.float32)

        ref = rrs.SpacedDiffusion(
            use_timesteps=set(SPEC6),
            betas=rgd.get_named_beta_schedule("cosine", 1000),
            model_mean_type=rgd.ModelMeanType.EPSILON,
            model_var_type=rgd.ModelVarType.LEARNED_RANGE,
            loss_type=rgd.LossType.MSE)
        i = 2
        t = torch.tensor([i, i])
        pmv = ref.p_mean_variance(lambda x_, t_, **kw: torch.from_numpy(out),
                                  torch.from_numpy(x), t, clip_denoised=True)
        want = ref.condition_mean(
            lambda x_, t_, **kw: torch.from_numpy(grad), pmv,
            torch.from_numpy(x), t, model_kwargs={}).numpy()

        tables = build_tables(SPEC6, base_schedule="cosine")
        mean, var, _, _ = p_mean_variance(
            tables, jnp.asarray(out.transpose(0, 2, 3, 1)),
            jnp.asarray(x.transpose(0, 2, 3, 1)), i,
            mean_type=ModelMeanType.EPSILON,
            var_type=ModelVarType.LEARNED_RANGE, clip_denoised=True)
        got = mean + var * jnp.asarray(grad.transpose(0, 2, 3, 1))
        np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                                   atol=1e-5, rtol=1e-5)


class TestReviewRegressions:
    def test_fixed_large_vector_t_broadcasts_correctly(self):
        """FIXED_LARGE with a per-sample t vector (the shape vb_terms_bpd
        always uses) must give (B,1,1,1) variance — a bare [B] condition
        broadcast along channels as (B,1,1,B), crashing or silently
        corrupting bpd when B == C."""
        from autodiffusion_tpu.samplers.diffusion import (ModelVarType,
                                                          p_mean_variance)
        from autodiffusion_tpu.schedules import build_tables

        tables = build_tables([0, 250, 500, 750], base_schedule="cosine")
        x = jnp.zeros((3, 8, 8, 3))          # B == C: the silent case
        out = jnp.zeros((3, 8, 8, 3))
        t = jnp.asarray([0, 1, 3])
        from autodiffusion_tpu.samplers.diffusion import ModelMeanType
        r = p_mean_variance(tables, out, x, t,
                            mean_type=ModelMeanType.EPSILON,
                            var_type=ModelVarType.FIXED_LARGE)
        _, variance, _, _ = r
        assert variance.shape == (3, 1, 1, 1), variance.shape
        # index 0 takes posterior_variance[1], others take betas[i]
        pv = np.asarray(tables.posterior_variance)
        b = np.asarray(tables.betas)
        got = np.asarray(variance).reshape(-1)
        np.testing.assert_allclose(got, [pv[1], b[1], b[3]], rtol=1e-6)

    def test_samplers_accept_bf16_noise_and_model(self):
        """bf16 noise= inputs and bf16 model outputs must not crash the
        scan carries / lax.switch branches (the loops pin to the table
        dtype)."""
        from autodiffusion_tpu.samplers import (ddim_sample_loop,
                                                plms_sample_loop)
        from autodiffusion_tpu.samplers.diffusion import ModelVarType
        from autodiffusion_tpu.schedules import build_sd_tables

        tables = build_sd_tables([94, 354, 574, 834])

        def bf16_model(x, t, i):
            return (0.1 * x).astype(jnp.bfloat16)

        noise = jnp.zeros((2, 8, 8, 3), jnp.bfloat16)
        a = ddim_sample_loop(bf16_model, (2, 8, 8, 3), tables,
                             rng=jax.random.key(0), clip_denoised=False,
                             var_type=ModelVarType.FIXED_SMALL, noise=noise)
        b = plms_sample_loop(bf16_model, (2, 8, 8, 3), tables,
                             rng=jax.random.key(0), noise=noise)
        assert np.isfinite(np.asarray(a)).all()
        assert np.isfinite(np.asarray(b)).all()

    def test_final_step_noise_selects_compvis_semantics(self):
        """With build_sd_tables and eta>0, sigma[0] is nonzero when step 0
        is absent from the subset; final_step_noise=True (CompVis) adds
        that draw, the ADM default zeroes it."""
        from autodiffusion_tpu.samplers import ddim_sample_loop
        from autodiffusion_tpu.samplers.diffusion import ModelVarType
        from autodiffusion_tpu.schedules import build_sd_tables

        tables = build_sd_tables([94, 354, 574, 834])

        def model(x, t, i):
            return 0.1 * x

        kw = dict(rng=jax.random.key(0), eta=1.0, clip_denoised=False,
                  var_type=ModelVarType.FIXED_SMALL,
                  noise=jnp.ones((1, 8, 8, 3)))
        adm = ddim_sample_loop(model, (1, 8, 8, 3), tables, **kw)
        compvis = ddim_sample_loop(model, (1, 8, 8, 3), tables,
                                   final_step_noise=True, **kw)
        assert not np.allclose(np.asarray(adm), np.asarray(compvis))
