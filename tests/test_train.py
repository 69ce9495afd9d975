"""Training losses parity, resamplers, and the sharded train step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autodiffusion_tpu.models import UNetModel
from autodiffusion_tpu.parallel import (data_sharder, make_mesh,
                                        param_shardings, replicate,
                                        shard_batch)
from autodiffusion_tpu.samplers import ModelMeanType, ModelVarType
from autodiffusion_tpu.schedules import build_base_tables, build_tables
from autodiffusion_tpu.train import (LossSecondMomentResampler, LossType,
                                     UniformSampler, create_train_state,
                                     make_train_step, normal_kl,
                                     training_losses)

pytestmark = pytest.mark.slow

SPEC6 = [94, 834, 217, 944, 574, 354]


class TestLossParity:
    @pytest.mark.parametrize("loss_type,ref_loss", [
        ("mse", "MSE"), ("rescaled_mse", "RESCALED_MSE"), ("kl", "KL"),
    ])
    def test_training_losses_match_reference(self, reference_gd, loss_type, ref_loss):
        import torch
        from guided_diffusion import gaussian_diffusion as rgd
        from guided_diffusion import respace as rrs

        rng = np.random.RandomState(0)
        x0 = rng.randn(4, 3, 8, 8).astype(np.float32)
        noise = rng.randn(4, 3, 8, 8).astype(np.float32)
        model_out = (rng.randn(4, 6, 8, 8).astype(np.float32) * 0.1)
        t = np.array([0, 2, 3, 5])

        ref = rrs.SpacedDiffusion(
            use_timesteps=set(SPEC6),
            betas=rgd.get_named_beta_schedule("cosine", 1000),
            model_mean_type=rgd.ModelMeanType.EPSILON,
            model_var_type=rgd.ModelVarType.LEARNED_RANGE,
            loss_type=getattr(rgd.LossType, ref_loss))
        want = ref.training_losses(
            lambda x, tt, **kw: torch.from_numpy(model_out),
            torch.from_numpy(x0), torch.from_numpy(t),
            noise=torch.from_numpy(noise))

        tables = build_tables(SPEC6, base_schedule="cosine")
        got = training_losses(
            tables, lambda x_t, t_orig: jnp.asarray(model_out.transpose(0, 2, 3, 1)),
            jnp.asarray(x0.transpose(0, 2, 3, 1)), jnp.asarray(t),
            jax.random.key(0), loss_type=loss_type,
            noise=jnp.asarray(noise.transpose(0, 2, 3, 1)))
        for k in want:
            np.testing.assert_allclose(np.asarray(got[k]), want[k].numpy(),
                                       atol=1e-4, rtol=1e-4, err_msg=k)

    def test_normal_kl_zero_for_identical(self):
        kl = normal_kl(jnp.ones(3), jnp.zeros(3), jnp.ones(3), jnp.zeros(3))
        np.testing.assert_allclose(np.asarray(kl), 0.0, atol=1e-7)



class TestResamplers:
    def test_uniform_weights(self):
        s = UniformSampler(10)
        t, w = s.sample(1000, np.random.RandomState(0))
        assert t.min() >= 0 and t.max() < 10
        np.testing.assert_allclose(w, 1.0)

    def test_loss_aware_prefers_high_loss_steps(self):
        s = LossSecondMomentResampler(4, history_per_term=3)
        for _ in range(3):
            s.update_with_losses([0, 1, 2, 3], [10.0, 0.1, 0.1, 0.1])
        w = s.weights()
        assert w[0] > 10 * w[1]
        t, iw = s.sample(2000, np.random.RandomState(0))
        assert (t == 0).mean() > 0.5          # importance-sampled toward step 0
        assert iw[t == 0].mean() < iw[t == 1].mean()  # compensating weights


def _tiny_setup(class_cond=False):
    m = UNetModel(model_channels=32, out_channels=6, num_res_blocks=1,
                  attention_ds=(2,), channel_mult=(1, 2), num_head_channels=32,
                  num_classes=10 if class_cond else None)
    args = [jnp.zeros((2, 8, 8, 3)), jnp.array([0.0, 1.0])]
    if class_cond:
        args.append(jnp.array([0, 1]))
    params = m.init(jax.random.key(0), *args)
    return m, params


class TestTrainStep:
    def test_train_step_updates_params_and_ema_tracks(self):
        m, params = _tiny_setup()
        tables = build_base_tables("cosine", 1000)
        state = create_train_state(params, lr=1e-5, ema_rates=(0.5,))
        step = jax.jit(make_train_step(m.apply))

        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(8, 8, 8, 3).astype(np.float32)) * 0.1
        losses = []
        for i in range(5):
            t = jnp.asarray(rng.randint(0, 1000, 8))
            state, metrics = step(state, tables, {"x": x}, t,
                                  jnp.ones(8), jax.random.key(i))
            losses.append(float(metrics["loss"]))
        assert int(state.step) == 5
        assert all(np.isfinite(l) for l in losses)
        p0 = np.asarray(jax.tree_util.tree_leaves(params)[0])
        pc = np.asarray(jax.tree_util.tree_leaves(state.params)[0])
        pe = np.asarray(jax.tree_util.tree_leaves(state.ema_params[0])[0])
        # the optimizer moved the params, and the EMA (a convex average of
        # the trajectory) lies strictly between init and current: distinct
        # from both and closer to current than init is
        assert not np.allclose(pc, p0)
        assert not np.allclose(pe, pc) and not np.allclose(pe, p0)
        assert np.linalg.norm(pe - pc) < np.linalg.norm(p0 - pc)

    def test_microbatch_accumulation_matches_manual_grads(self):
        """microbatches=4 must equal manually averaging the 4 slices'
        gradients computed with the step's own per-microbatch key stream
        (jax.random.split(rng, microbatches)) and applying them once."""
        from autodiffusion_tpu.train.losses import training_losses

        m, params = _tiny_setup()
        tables = build_base_tables("cosine", 1000)
        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.randn(8, 8, 8, 3).astype(np.float32))
        t = jnp.asarray(rng.randint(0, 1000, 8))
        w = jnp.ones(8)
        key = jax.random.key(0)

        s2 = create_train_state(params, lr=1e-3)
        micro = make_train_step(m.apply, microbatches=4)
        s2, m2 = micro(s2, tables, {"x": x}, t, w, key)

        def loss_i(p, xi, ti, wi, ki):
            terms = training_losses(
                tables, lambda x_t, t_orig: m.apply(p, x_t, t_orig),
                xi, ti, ki)
            return (terms["loss"] * wi).mean()

        keys = jax.random.split(key, 4)
        grads = None
        for i in range(4):
            sl = slice(2 * i, 2 * i + 2)
            g = jax.grad(loss_i)(params, x[sl], t[sl], w[sl], keys[i])
            grads = g if grads is None else jax.tree_util.tree_map(
                jnp.add, grads, g)
        grads = jax.tree_util.tree_map(lambda a: a / 4.0, grads)
        s_manual = create_train_state(params, lr=1e-3).apply_gradients(grads)

        for a, b in zip(jax.tree_util.tree_leaves(s2.params),
                        jax.tree_util.tree_leaves(s_manual.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6, rtol=1e-5)

    def test_sharded_train_step_runs_on_mesh(self):
        assert jax.device_count() == 8
        mesh = make_mesh(model_parallel=1)
        m, params = _tiny_setup(class_cond=True)
        params = replicate(mesh, params)
        tables = build_base_tables("cosine", 1000)
        state = create_train_state(params, lr=1e-3)
        step = jax.jit(make_train_step(m.apply, class_cond=True,
                                       data_sharder=data_sharder(mesh)))
        rng = np.random.RandomState(2)
        batch = shard_batch(mesh, {
            "x": rng.randn(16, 8, 8, 3).astype(np.float32),
            "y": rng.randint(0, 10, 16),
        })
        t = jnp.asarray(rng.randint(0, 1000, 16))
        state, metrics = step(state, tables, batch, t, jnp.ones(16),
                              jax.random.key(0))
        assert np.isfinite(float(metrics["loss"]))
        assert metrics["per_example_loss"].shape == (16,)

    def test_tensor_parallel_shardings_assign_model_axis(self):
        mesh = make_mesh(model_parallel=2)
        m, params = _tiny_setup()
        shardings = param_shardings(mesh, params["params"], min_weight_size=1024)
        specs = [s.spec for s in jax.tree_util.tree_leaves(shardings)]
        assert any("model" in str(s) for s in specs), "no kernel got TP-sharded"


class TestResume:
    def test_save_then_resume_continues_bitwise(self, tmp_path):
        """Train 3 steps -> save -> resume into a FRESH state: step counter,
        params, EMA, and optimizer state continue bitwise; two more steps on
        the resumed state match an uninterrupted 5-step run exactly
        (train_util.py:124-165,780-792 resume semantics)."""
        from autodiffusion_tpu.train import resume_train_state
        from autodiffusion_tpu.utils.checkpoint import save_tree

        m, params = _tiny_setup()
        tables = build_base_tables("cosine", 1000)
        step = jax.jit(make_train_step(m.apply))
        rng = np.random.RandomState(2)
        x = jnp.asarray(rng.randn(8, 8, 8, 3).astype(np.float32)) * 0.1
        ts = [jnp.asarray(rng.randint(0, 1000, 8)) for _ in range(5)]

        def run(state, lo, hi):
            for i in range(lo, hi):
                state, _ = step(state, tables, {"x": x}, ts[i],
                                jnp.ones(8), jax.random.key(i))
            return state

        gold = run(create_train_state(params, lr=1e-3, ema_rates=(0.9,)), 0, 5)

        state = run(create_train_state(params, lr=1e-3, ema_rates=(0.9,)), 0, 3)
        d = str(tmp_path)
        save_tree(f"{d}/model{int(state.step):06d}.msgpack", state.params)
        save_tree(f"{d}/ema_0.9_{int(state.step):06d}.msgpack",
                  state.ema_params[0])
        save_tree(f"{d}/opt{int(state.step):06d}.msgpack", state.opt_state)

        fresh = create_train_state(params, lr=1e-3, ema_rates=(0.9,))
        resumed = resume_train_state(fresh, d)
        assert int(resumed.step) == 3
        for a, b in zip(jax.tree_util.tree_leaves(resumed.params),
                        jax.tree_util.tree_leaves(state.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        final = run(resumed, 3, 5)
        assert int(final.step) == 5
        for a, b in zip(jax.tree_util.tree_leaves(final.params),
                        jax.tree_util.tree_leaves(gold.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(final.ema_params),
                        jax.tree_util.tree_leaves(gold.ema_params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_resume_missing_dir_raises(self, tmp_path):
        from autodiffusion_tpu.train import resume_train_state
        m, params = _tiny_setup()
        state = create_train_state(params, lr=1e-3)
        with pytest.raises(FileNotFoundError):
            resume_train_state(state, str(tmp_path))


class TestCrossProcessLossAwareSampler:
    def test_local_update_gathers_across_processes(self, monkeypatch):
        """update_with_local_losses must fold every rank's (t, loss) pairs
        into the history (reference resample.py:71-104), so each rank ends
        with the identical sampling distribution."""
        from autodiffusion_tpu.train import LossSecondMomentResampler
        import autodiffusion_tpu.parallel.dist as dist

        other_t = np.array([5, 6])
        other_loss = np.array([9.0, 1.0])

        def fake_gather(x):
            # simulate 2 processes: this rank's data + a peer's
            peer = other_t if x.dtype.kind in "iu" else other_loss
            return np.stack([np.asarray(x), peer])

        monkeypatch.setattr(dist, "all_gather_host", fake_gather)
        s = LossSecondMomentResampler(10, history_per_term=2)
        s.update_with_local_losses(np.array([1, 2]), np.array([4.0, 2.0]))
        # both local (1,2) and peer (5,6) timesteps recorded
        assert s._loss_counts[1] == 1 and s._loss_counts[2] == 1
        assert s._loss_counts[5] == 1 and s._loss_counts[6] == 1
        assert s._loss_history[5, 0] == 9.0

    def test_single_process_is_identity(self):
        from autodiffusion_tpu.train import LossSecondMomentResampler
        s = LossSecondMomentResampler(10, history_per_term=1)
        s.update_with_local_losses(np.array([3]), np.array([2.0]))
        assert s._loss_counts[3] == 1 and s._loss_history[3, 0] == 2.0


class TestOFAReviewRegressions:
    """Round-3 review findings: section-count coupling, the random-select
    sandwich, microbatch validation."""

    def test_section_counts_coupled(self):
        import random as pyrandom

        from autodiffusion_tpu.train.loop import _ofa_section_counts
        rng = pyrandom.Random(0)
        for _ in range(200):
            c = _ofa_section_counts(rng, (2, 4, 6, 8), 4)
            assert c[1] >= c[0] and c[2] >= c[3], c

    def test_random_select_returns_reference_sandwich(self):
        import random as pyrandom

        from autodiffusion_tpu.train import ofa_random_select_tables_fn
        fn = ofa_random_select_tables_fn("cosine", 1000, k_menu=(25, 50))
        rng = pyrandom.Random(0)
        for step in range(5):
            tlist = fn(step, rng)
            assert len(tlist) == 4
            assert tlist[0].num_steps == 1000            # largest
            assert tlist[1].num_steps in (25, 50)        # random (bucketed)
            assert tlist[2].num_steps in (25, 50)
            assert tlist[3].num_steps == 4               # smallest
            # the max-noise base step is always trained (reference set
            # includes original_num_steps - 1)
            assert int(tlist[3].timestep_map[-1]) == 999

    def test_sandwich_step_one_update_from_four_schedules(self):
        import random as pyrandom

        from autodiffusion_tpu.train import (TrainLoop, create_train_state,
                                             make_train_step,
                                             ofa_random_select_tables_fn)

        m, params = _tiny_setup()
        state = create_train_state(params, lr=1e-4)
        raw = make_train_step(m.apply)
        rng = np.random.RandomState(0)
        batch = {"x": rng.randn(4, 8, 8, 3).astype(np.float32) * 0.1}
        data = iter(lambda: batch, None)
        loop = TrainLoop(
            state=state, step_fn=jax.jit(raw),
            grad_fn=jax.jit(raw.grads_and_metrics), data=data,
            tables_fn=ofa_random_select_tables_fn("cosine", 1000,
                                                  k_menu=(4, 6)),
            batch_size=4, log_interval=0, save_interval=0)
        loop.run_loop(max_steps=2)
        # four schedules per step, ONE optimizer update per step
        assert int(loop.state.step) == 2
        # params actually moved (some leaves are zero-init; check globally)
        diff = max(float(np.abs(np.asarray(a) - np.asarray(b)).max())
                   for a, b in zip(jax.tree_util.tree_leaves(params),
                                   jax.tree_util.tree_leaves(loop.state.params)))
        assert diff > 0.0

    def test_sandwich_without_grad_fn_fails_loud(self):
        import pytest

        from autodiffusion_tpu.train import (TrainLoop, create_train_state,
                                             make_train_step)
        from autodiffusion_tpu.schedules import build_base_tables

        m, params = _tiny_setup()
        state = create_train_state(params, lr=1e-4)
        batch = {"x": np.zeros((4, 8, 8, 3), np.float32)}
        loop = TrainLoop(
            state=state, step_fn=jax.jit(make_train_step(m.apply)),
            data=iter(lambda: batch, None),
            tables_fn=lambda s, r: [build_base_tables("cosine", 1000)],
            batch_size=4, log_interval=0, save_interval=0)
        with pytest.raises(ValueError, match="grad_fn"):
            loop.run_loop(max_steps=1)

    def test_microbatch_must_divide_batch(self):
        import pytest

        m, params = _tiny_setup()
        tables = build_base_tables("cosine", 1000)
        state = create_train_state(params, lr=1e-4)
        step = jax.jit(make_train_step(m.apply, microbatches=3))
        x = jnp.zeros((16, 8, 8, 3))
        t = jnp.zeros((16,), jnp.int32)
        w = jnp.ones((16,))
        with pytest.raises(ValueError, match="microbatch"):
            step(state, tables, {"x": x}, t, w, jax.random.key(0))
