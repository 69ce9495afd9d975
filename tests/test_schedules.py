"""Schedule math: invariants + golden parity against the reference package."""

import numpy as np
import pytest

from autodiffusion_tpu.schedules import (
    ScheduleTables,
    build_base_tables,
    build_tables,
    make_beta_schedule,
    make_ddim_timesteps,
    respaced_betas,
    space_timesteps,
    stack_tables,
)


class TestBetaSchedules:
    def test_linear_endpoints(self):
        b = make_beta_schedule("linear", 1000)
        assert b.shape == (1000,)
        assert b.dtype == np.float64
        np.testing.assert_allclose(b[0], 1e-4)
        np.testing.assert_allclose(b[-1], 0.02)

    def test_linear_scales_with_T(self):
        # T=500 uses scale 2: same endpoints scaled
        b = make_beta_schedule("linear", 500)
        np.testing.assert_allclose(b[0], 2e-4)
        np.testing.assert_allclose(b[-1], 0.04)

    def test_cosine_monotone_and_clipped(self):
        b = make_beta_schedule("cosine", 1000)
        assert (b > 0).all() and (b <= 0.999).all()
        assert (np.diff(b[:-5]) > 0).all()  # increasing away from the clip

    def test_sqrt_linear_sd_defaults(self):
        b = make_beta_schedule("sqrt_linear", 1000)
        np.testing.assert_allclose(b[0], 8.5e-4, rtol=1e-12)
        np.testing.assert_allclose(b[-1], 1.2e-2, rtol=1e-12)


class TestSpaceTimesteps:
    def test_ddim_stride(self):
        assert space_timesteps(1000, "ddim4") == {0, 250, 500, 750}
        assert space_timesteps(1000, "ddim10") == set(range(0, 1000, 100))

    def test_ddim_impossible(self):
        with pytest.raises(ValueError):
            space_timesteps(1000, "ddim999")  # no integer stride gives exactly 999

    def test_sections(self):
        assert space_timesteps(100, [100]) == set(range(100))
        got = space_timesteps(1000, "10,10,10")
        assert len(got) == 30

    def test_parity_with_reference(self, reference_gd):
        from guided_diffusion.respace import space_timesteps as ref_st
        for spec in ["ddim4", "ddim10", "ddim25", "10,10,10", [4], [250, 250]]:
            assert space_timesteps(1000, spec) == ref_st(1000, spec), spec


class TestRespacedBetas:
    def test_preserves_alphabar_at_kept_steps(self):
        base = make_beta_schedule("cosine", 1000)
        abar = np.cumprod(1 - base)
        keep = [94, 834, 217, 944, 574, 354]  # searched 6-step artifact
        betas, tmap = respaced_betas(abar, keep)
        assert tmap == sorted(keep)
        new_abar = np.cumprod(1 - betas)
        np.testing.assert_allclose(new_abar, abar[tmap], rtol=1e-12)

    def test_dedup_and_bounds(self):
        abar = np.cumprod(1 - make_beta_schedule("linear", 100))
        betas, tmap = respaced_betas(abar, [5, 5, 50])
        assert tmap == [5, 50] and len(betas) == 2
        with pytest.raises(ValueError):
            respaced_betas(abar, [100])
        with pytest.raises(ValueError):
            respaced_betas(abar, [])


class TestTablesParity:
    """Golden parity: every coefficient array matches the reference's
    SpacedDiffusion (gaussian_diffusion.py:118-169, respace.py:63-85)."""

    FIELDS = [
        "betas", "alphas_cumprod", "alphas_cumprod_prev", "alphas_cumprod_next",
        "sqrt_alphas_cumprod", "sqrt_one_minus_alphas_cumprod",
        "log_one_minus_alphas_cumprod", "sqrt_recip_alphas_cumprod",
        "sqrt_recipm1_alphas_cumprod", "posterior_variance",
        "posterior_log_variance_clipped", "posterior_mean_coef1",
        "posterior_mean_coef2",
    ]

    @pytest.mark.parametrize("schedule,spec", [
        ("cosine", "ddim4"),
        ("cosine", [94, 834, 217, 944, 574, 354]),
        ("linear", "ddim10"),
        ("linear", [644, 737, 67, 804, 134, 871, 6, 639, 268, 335, 402, 469, 536, 603, 670]),
    ])
    def test_matches_reference(self, reference_gd, schedule, spec):
        from guided_diffusion import gaussian_diffusion as rgd
        from guided_diffusion import respace as rrs

        base = rgd.get_named_beta_schedule(schedule, 1000)
        use = rrs.space_timesteps(1000, spec) if isinstance(spec, str) else set(spec)
        ref = rrs.SpacedDiffusion(
            use_timesteps=use, betas=base,
            model_mean_type=rgd.ModelMeanType.EPSILON,
            model_var_type=rgd.ModelVarType.LEARNED_RANGE,
            loss_type=rgd.LossType.MSE,
        )
        ours = build_tables(use, base_schedule=schedule, base_num_steps=1000)
        np.testing.assert_array_equal(np.asarray(ours.timestep_map), ref.timestep_map)
        for f in self.FIELDS:
            np.testing.assert_allclose(
                np.asarray(ours.gather(f, slice(None)), dtype=np.float64),
                getattr(ref, f), rtol=2e-7, atol=1e-9, err_msg=f)

    def test_base_tables_match_reference_full_process(self, reference_gd):
        from guided_diffusion import gaussian_diffusion as rgd
        ref = rgd.GaussianDiffusion(
            betas=rgd.get_named_beta_schedule("cosine", 1000),
            model_mean_type=rgd.ModelMeanType.EPSILON,
            model_var_type=rgd.ModelVarType.LEARNED_RANGE,
            loss_type=rgd.LossType.MSE,
        )
        ours = build_base_tables("cosine", 1000)
        for f in self.FIELDS:
            np.testing.assert_allclose(
                np.asarray(ours.gather(f, slice(None)), dtype=np.float64),
                getattr(ref, f), rtol=2e-7, atol=1e-9, err_msg=f)


class TestStackTables:
    def test_stack_and_gather(self):
        t1 = build_tables("ddim4", base_schedule="cosine")
        t2 = build_tables([10, 200, 600, 900], base_schedule="cosine")
        s = stack_tables([t1, t2])
        assert s.betas.shape == (2, 4)
        assert s.num_steps == 4
        np.testing.assert_array_equal(np.asarray(s.timestep_map[1]), [10, 200, 600, 900])

    def test_mismatched_K_rejected(self):
        t1 = build_tables("ddim4", base_schedule="cosine")
        t2 = build_tables("ddim10", base_schedule="cosine")
        with pytest.raises(ValueError):
            stack_tables([t1, t2])


class TestDdimTimestepsSD:
    def test_uniform_offset(self):
        steps = make_ddim_timesteps("uniform", 50, 1000)
        assert steps[0] == 1 and steps[1] == 21 and len(steps) == 50

    def test_uniform_nondivisor_matches_reference_rounding(self):
        # reference rounds the stride and does not truncate
        # (ldm/modules/diffusionmodules/util.py:46-48): 30 steps at T=1000
        # -> stride 33 -> 31 steps ending at 991
        steps = make_ddim_timesteps("uniform", 30, 1000)
        assert len(steps) == 31 and steps[-1] == 991 and steps[1] - steps[0] == 33

    def test_quad(self):
        steps = make_ddim_timesteps("quad", 10, 1000)
        assert steps[0] == 1 and steps[-1] <= 1000 and len(steps) == 10

    @pytest.mark.parametrize("method,n", [("uniform", 50), ("uniform", 30),
                                          ("uniform", 4), ("quad", 10)])
    def test_matches_reference_function(self, method, n):
        import os
        import sys
        sd_ref = "/root/reference/examples/Stable Diffusion"
        if not os.path.isdir(sd_ref):
            pytest.skip("SD reference not available")
        if sd_ref not in sys.path:
            sys.path.insert(0, sd_ref)
        try:
            from ldm.modules.diffusionmodules.util import \
                make_ddim_timesteps as ref_fn
        except Exception as e:
            pytest.skip(f"SD reference import failed: {e}")
        np.testing.assert_array_equal(
            make_ddim_timesteps(method, n, 1000),
            ref_fn(method, n, 1000, verbose=False))


class TestSDTablesStepZero:
    def test_subset_containing_step_zero_is_nan_free(self):
        """Regression: the CompVis alphas_prev quirk makes beta[0] == 0
        when step 0 is in the subset; the posterior fields must come from
        the exact (a, a_prev) arrays, not _derive's internal cumprod
        (which hit 0/0). EA candidates routinely contain step 0."""
        import numpy as np

        from autodiffusion_tpu.schedules import build_sd_tables

        t = build_sd_tables([0, 100, 400, 700])
        for field in ("posterior_variance", "posterior_mean_coef1",
                      "posterior_mean_coef2",
                      "posterior_log_variance_clipped"):
            arr = np.asarray(getattr(t, field))
            assert np.isfinite(arr).all(), (field, arr)
        assert float(t.posterior_variance[0]) == 0.0
        # non-zero-step subsets keep their previous (already finite) values
        t2 = build_sd_tables([100, 400, 700])
        assert np.isfinite(np.asarray(t2.posterior_mean_coef1)).all()
