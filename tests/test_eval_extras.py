"""Precision/recall, sFID plumbing, and NLL (bpd) evaluation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autodiffusion_tpu.fid import (FIDEvaluator, FIDStats, precision_recall)
from autodiffusion_tpu.schedules import build_tables
from autodiffusion_tpu.train import calc_bpd_loop


class TestPrecisionRecall:
    def test_identical_sets_score_one(self):
        feats = np.random.RandomState(0).randn(200, 8).astype(np.float32)
        p, r = precision_recall(feats, feats.copy())
        assert p == 1.0 and r == 1.0

    def test_disjoint_sets_score_zero(self):
        rng = np.random.RandomState(1)
        a = rng.randn(150, 8).astype(np.float32)
        b = rng.randn(150, 8).astype(np.float32) + 100.0
        p, r = precision_recall(a, b)
        assert p == 0.0 and r == 0.0

    def test_mode_dropping_hits_recall_not_precision(self):
        rng = np.random.RandomState(2)
        # reference has two modes; samples only cover one
        ref = np.concatenate([rng.randn(150, 8), rng.randn(150, 8) + 20])
        samples = rng.randn(200, 8) * 0.8
        p, r = precision_recall(ref.astype(np.float32),
                                samples.astype(np.float32))
        assert p > 0.8            # samples lie inside the covered mode
        assert r < 0.7            # half the reference modes uncovered


class TestSfidPlumbing:
    def test_cal_metrics_includes_sfid(self):
        rng = np.random.RandomState(0)

        def feature_fn(imgs):
            x = imgs.astype(jnp.float32).reshape(imgs.shape[0], -1)
            return {"pool3": x[:, :8],
                    "spatial": x[:, :6].reshape(-1, 1, 2, 3),
                    "logits": x[:, :4]}

        imgs = rng.randint(0, 255, (64, 4, 4, 3)).astype(np.uint8)
        ref_imgs = rng.randint(0, 255, (64, 4, 4, 3)).astype(np.uint8)
        ev0 = FIDEvaluator(feature_fn, None, batch_size=32)  # type: ignore
        ref_pool, _, ref_spatial = ev0.compute_activations(ref_imgs,
                                                           want_spatial=True)
        ev = FIDEvaluator(feature_fn, FIDStats.from_features(ref_pool),
                          ref_stats_spatial=FIDStats.from_features(ref_spatial),
                          batch_size=32)
        m = ev.cal_metrics(imgs, ref_features=ref_pool)
        for k in ("fid", "sfid", "inception_score", "precision", "recall"):
            assert k in m and np.isfinite(m[k]), (k, m)


class TestBpdLoop:
    def test_bpd_parity_with_reference(self, reference_gd):
        import torch
        from guided_diffusion import gaussian_diffusion as rgd
        from guided_diffusion import respace as rrs

        spec = [94, 217, 574, 944]
        rng = np.random.RandomState(0)
        x0 = (rng.rand(2, 3, 8, 8).astype(np.float32) * 2 - 1)
        model_out = rng.randn(2, 6, 8, 8).astype(np.float32) * 0.1

        ref = rrs.SpacedDiffusion(
            use_timesteps=set(spec),
            betas=rgd.get_named_beta_schedule("cosine", 1000),
            model_mean_type=rgd.ModelMeanType.EPSILON,
            model_var_type=rgd.ModelVarType.LEARNED_RANGE,
            loss_type=rgd.LossType.MSE)
        # the reference draws noise internally; compare only the
        # noise-independent pieces: prior_bpd exactly, total_bpd loosely
        want_prior = ref._prior_bpd(torch.from_numpy(x0)).numpy()

        tables = build_tables(spec, base_schedule="cosine")
        got = calc_bpd_loop(
            tables, lambda x_t, t: jnp.asarray(model_out.transpose(0, 2, 3, 1)),
            jnp.asarray(x0.transpose(0, 2, 3, 1)), jax.random.key(0))
        np.testing.assert_allclose(np.asarray(got["prior_bpd"]), want_prior,
                                   atol=1e-4, rtol=1e-4)
        assert got["vb"].shape == (4, 2)
        assert np.isfinite(np.asarray(got["total_bpd"])).all()


class TestEvaluateCLIPrecisionRecall:
    def test_evaluate_cli_with_ref_batch(self, tmp_path, capsys):
        """adt evaluate --ref_batch computes precision/recall (the
        reference evaluator.py's two-batch mode) alongside FID/IS."""
        import json as jsonlib

        import torch

        from autodiffusion_tpu.cli.main import main
        from autodiffusion_tpu.fid import FIDInceptionV3
        from test_inception_loader import synthesize_torch_state

        shapes = jax.eval_shape(lambda: FIDInceptionV3().init(
            jax.random.key(0), jnp.zeros((1, 299, 299, 3))))
        sd = synthesize_torch_state(
            jax.tree_util.tree_map(lambda s: np.zeros(s.shape, s.dtype),
                                   shapes), np.random.RandomState(0))
        pth = str(tmp_path / "pt_inception.pth")
        torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, pth)

        rng = np.random.RandomState(1)
        samples = str(tmp_path / "samples.npz")
        refs = str(tmp_path / "refs.npz")
        np.savez(samples, arr_0=rng.randint(0, 255, (8, 16, 16, 3)
                                            ).astype(np.uint8))
        np.savez(refs, arr_0=rng.randint(0, 255, (8, 16, 16, 3)
                                         ).astype(np.uint8))

        # an 8-sample fixture necessarily has a rank-deficient 2048-dim
        # covariance, so scipy's sqrtm legitimately warns; silence it
        # explicitly to keep the suite's warning signal clean
        import warnings

        from scipy.linalg import LinAlgWarning

        with warnings.catch_warnings():
            warnings.simplefilter("ignore", LinAlgWarning)
            rc = main(["evaluate", "--sample_batch", samples,
                       "--ref_stats", refs, "--ref_batch", refs,
                       "--inception_path", pth, "--batch_size", "4"])
        assert rc == 0
        out = capsys.readouterr().out.strip().splitlines()[-1]
        m = jsonlib.loads(out)
        for k in ("fid", "inception_score", "precision", "recall"):
            assert k in m and np.isfinite(m[k]), (k, m)
