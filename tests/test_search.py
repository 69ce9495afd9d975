"""Search layer: spaces, EA driver with mock fitness, batched FID fitness."""

import random as pyrandom

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autodiffusion_tpu.fid import FIDStats
from autodiffusion_tpu.search import (BatchedFIDFitness, ContinuousTimeSpace,
                                      EvolutionSearcher, JointSpace,
                                      TimestepSpace, make_adm_fitness,
                                      parse_joint_string,
                                      parse_timestep_string,
                                      progressive_skip_hook, to_uint8)

pytestmark = pytest.mark.slow


class TestSpaces:
    def test_timestep_random_properties(self):
        sp = TimestepSpace(1000, 6, rng=pyrandom.Random(0))
        for _ in range(20):
            c = sp.random()
            assert len(c) == 6 and len(set(c)) == 6
            assert c == tuple(sorted(c))
            assert all(0 <= t < 1000 for t in c)

    def test_timestep_seed_is_ddim(self):
        sp = TimestepSpace(1000, 4)
        assert sp.seed() == (0, 250, 500, 750)

    def test_mutation_keeps_k_distinct(self):
        sp = TimestepSpace(1000, 6, rng=pyrandom.Random(1))
        c = sp.random()
        for _ in range(20):
            m = sp.mutate(c, 0.5)
            assert len(m) == 6 and len(set(m)) == 6

    def test_mutation_prob_zero_is_identity(self):
        sp = TimestepSpace(1000, 6, rng=pyrandom.Random(2))
        c = sp.random()
        assert sp.mutate(c, 0.0) == c

    def test_crossover_genes_from_parents(self):
        sp = TimestepSpace(1000, 4, rng=pyrandom.Random(3))
        c1, c2 = (1, 2, 3, 4), (101, 102, 103, 104)
        child = sp.crossover(c1, c2)
        assert all(g in c1 + c2 for g in child)

    def test_restricted_window(self):
        win = TimestepSpace.restricted_window([100, 500], 1000, radius=2)
        assert win == [98, 99, 100, 101, 102, 498, 499, 500, 501, 502]

    def test_parse_compat_strings(self):
        assert parse_timestep_string("[94, 834, 217]") == (94, 217, 834)
        ts, sk = parse_joint_string(
            "{'timesteps': [744, 137], 'skip_layers': [[3, 1], [2]]}")
        assert ts == (137, 744)
        assert sk == ((2,), (1, 3))   # aligned to sorted timesteps


    def test_joint_budget_respected(self):
        sp = JointSpace(1000, layer_num=10, max_index_number=35,
                        skip_layer_range=(0.0, 0.3), rng=pyrandom.Random(0))
        for _ in range(20):
            c = sp.random()
            assert sp.is_feasible(c), c
            m = sp.mutate(c, 0.4)
            assert sp.is_feasible(m), m
            x = sp.crossover(c, m)
            assert sp.is_feasible(x), x

    def test_joint_zero_skip_range_is_pure_timestep_search(self):
        sp = JointSpace(1000, layer_num=10, max_index_number=40,
                        skip_layer_range=(0.0, 0.0), rng=pyrandom.Random(1))
        c = sp.random()
        assert all(s == () for s in c[1])
        assert len(c[0]) == 4   # 40 budget / 10 layers

    def test_continuous_space(self):
        sp = ContinuousTimeSpace.uniform_grid(5, rng=pyrandom.Random(0))
        c = sp.random()
        assert len(c) == 5 and all(0 < t <= 1 for t in c)
        m = sp.mutate(c, 0.5)
        assert len(m) == 5 and len(set(m)) == 5


class TestEvolution:
    def _searcher(self, tmp_path=None, **kw):
        target = np.array([10, 200, 400, 600, 800, 950])

        def fitness(cands):
            # mock fitness: smooth distance of each gene to its target
            return [float(np.abs(np.sort(np.array(c)) - target).mean())
                    for c in cands]

        sp = TimestepSpace(1000, 6, rng=pyrandom.Random(0))
        defaults = dict(population_num=20, select_num=5, mutation_num=8,
                        crossover_num=6, m_prob=0.25, max_epochs=6,
                        use_ddim_init_x=True)
        defaults.update(kw)
        return EvolutionSearcher(
            sp, fitness,
            checkpoint_path=str(tmp_path / "ea.json") if tmp_path else None,
            **defaults), target

    def test_search_improves_over_random(self):
        searcher, target = self._searcher()
        best, fid = searcher.search()
        # random 6-subsets average ~130 mean gene distance; EA should descend
        assert fid < 60, (best, fid)
        assert len(searcher.vis_dict) > 50

    def test_population_evaluated_once(self):
        calls = []

        def fitness(cands):
            calls.extend(cands)
            return [float(sum(c)) for c in cands]

        sp = TimestepSpace(1000, 4, rng=pyrandom.Random(1))
        s = EvolutionSearcher(sp, fitness, population_num=10, select_num=3,
                              mutation_num=4, crossover_num=3, max_epochs=3)
        s.search()
        assert len(calls) == len(set(calls)), "memoization failed: re-evaluated"

    def test_checkpoint_resume(self, tmp_path):
        s1, _ = self._searcher(tmp_path, max_epochs=2)
        s1.search()
        s2, _ = self._searcher(tmp_path, max_epochs=4)
        s2.load()
        assert s2.epoch == 2
        assert s2.vis_dict == s1.vis_dict
        best, fid = s2.search()
        assert s2.epoch == 4

    def test_progressive_hook_widens(self):
        sp = JointSpace(1000, layer_num=10, max_index_number=40,
                        skip_layer_range=(0.0, 0.0), rng=pyrandom.Random(0))

        def fitness(cands):
            return [1.0 for _ in cands]   # constant -> stalls immediately

        s = EvolutionSearcher(sp, fitness, population_num=8, select_num=3,
                              mutation_num=3, crossover_num=2, max_epochs=5,
                              use_ddim_init_x=True,
                              on_epoch_start=progressive_skip_hook(max_prun=0.5))
        s.search()
        assert sp.skip_layer_range[1] > 0.0


class TestBatchedFitness:
    def _fitness(self, **kw):
        """Stub pipeline: 'sampling' = deterministic images keyed by the
        candidate's first table value; features = flattened pixels."""

        def payload_fn(cand):
            return {"v": jnp.asarray([float(cand[0])])}

        def sample_fn(static, payload, rng, batch_idx):
            base = payload["v"][:, 0] / 1000.0 * 2 - 1       # [N]
            img = base[:, None, None, None] * jnp.ones((1, 4, 4, 3))
            return to_uint8(img + 0.01 * jax.random.normal(rng, img.shape))

        def feature_fn(imgs):
            x = imgs.astype(jnp.float32).reshape(imgs.shape[0], -1)
            return {"pool3": x[:, :8]}

        ref_imgs = to_uint8(jnp.full((64, 4, 4, 3), 0.0)
                            + 0.01 * jax.random.normal(jax.random.key(9), (64, 4, 4, 3)))
        feats = np.asarray(feature_fn(ref_imgs)["pool3"])
        ref = FIDStats.from_features(feats)
        defaults = dict(payload_fn=payload_fn, sample_fn=sample_fn,
                        feature_fn=feature_fn, ref_stats=ref, num_samples=64,
                        batch_size=16, candidate_chunk=3, feature_dim=8)
        defaults.update(kw)
        return BatchedFIDFitness(**defaults)

    def test_ranks_by_distance_to_reference(self):
        f = self._fitness()
        cands = [(500, 600), (450, 800), (990, 995)]   # ref is ~500
        fids = f(cands)
        assert fids[0] < fids[2] and fids[1] < fids[2]

    def test_chunking_matches_individual(self):
        # chunked and individual runs draw different noise streams (the
        # candidates share one batch axis), so compare statistically
        f = self._fitness(candidate_chunk=4, seed=3)
        cands = [(100, 1), (450, 2), (700, 3), (950, 4), (250, 5)]
        batch = f(cands)
        g = self._fitness(candidate_chunk=1, seed=3)
        single = [g([c])[0] for c in cands]
        np.testing.assert_allclose(batch, single, rtol=0.05)
        assert np.argsort(batch).tolist() == np.argsort(single).tolist()

    def test_device_batch_cap_splits_evenly(self):
        # published config: chunk 4 x batch 100 capped at 128 samples per
        # dispatch -> 4 even sub-slices of 25 per candidate
        f = self._fitness(candidate_chunk=4, batch_size=100, num_samples=100,
                          max_device_batch=128)
        assert f.device_batch == 25
        # under the cap: unchanged; 0 disables
        assert self._fitness(max_device_batch=128).device_batch == 16
        assert self._fitness(candidate_chunk=4, batch_size=100,
                             max_device_batch=0).device_batch == 100

    def test_feature_params_threaded_as_argument(self):
        """feature_params + two-arg feature_fn(params, imgs) gives the
        same FIDs as a closure-bound one-arg feature_fn — the protocol
        the CLIs use so 95 MB of Inception weights enter the chunk
        program as a jit ARGUMENT, never a trace-time constant."""
        fp = {"scale": jnp.float32(2.0)}

        def two_arg(p, imgs):
            x = imgs.astype(jnp.float32).reshape(imgs.shape[0], -1)
            return {"pool3": x[:, :8] * p["scale"]}

        def bound(imgs):
            return two_arg(fp, imgs)

        cands = [(500, 1), (450, 2), (990, 3)]
        a = self._fitness(feature_fn=bound)(cands)
        b = self._fitness(feature_fn=two_arg, feature_params=fp)(cands)
        np.testing.assert_array_equal(a, b)

    def test_invalid_fid_guard(self):
        """A materially negative or non-finite FID at the fitness boundary
        raises instead of feeding the EA a corrupted landscape (round 4's
        reduced-precision s2 drove small-n FIDs to -5); tiny negatives from
        f32 Frechet noise clamp to 0."""
        f = self._fitness(candidate_chunk=2)
        f._device_frechet = lambda stats: jnp.asarray([-5.46, 1.0])
        with pytest.raises(FloatingPointError, match="invalid FID"):
            f([(500, 1), (450, 2)])
        f._device_frechet = lambda stats: jnp.asarray([jnp.nan, 1.0])
        with pytest.raises(FloatingPointError, match="invalid FID"):
            f([(500, 1), (450, 2)])
        f._device_frechet = lambda stats: jnp.asarray([-1e-4, 1.0])
        assert f([(500, 1), (450, 2)]) == [0.0, 1.0]

    def test_resume_is_bitwise_at_fitness_level(self, tmp_path):
        """A resumed search scores FRESH candidates with the same noise
        stream as an uninterrupted run: the fitness eval counter is part
        of the EA checkpoint (BatchedFIDFitness.get_state/set_state), so
        the two runs' vis_dicts are float-identical — not just for
        memoized candidates but for ones first seen after the resume."""
        def make(max_epochs, path):
            f = self._fitness(seed=5)
            sp = TimestepSpace(1000, 2, rng=pyrandom.Random(3))
            return EvolutionSearcher(
                sp, f, population_num=4, select_num=2, mutation_num=1,
                crossover_num=1, max_epochs=max_epochs,
                checkpoint_path=path)

        sa = make(3, str(tmp_path / "a.json"))
        sa.search()

        pb = str(tmp_path / "b.json")
        sb1 = make(1, pb)
        sb1.search()
        sb2 = make(3, pb)           # fresh fitness: eval counter at 0
        sb2.load()                  # ... restored from the checkpoint
        assert sb2.fitness_fn.get_state()["eval_count"] > 0
        sb2.search()
        # epochs 1-2 evaluate candidates never seen before the resume;
        # bitwise equality holds only if the noise stream continued
        assert set(sb2.vis_dict) - set(sb1.vis_dict), "no fresh candidates"
        assert sb2.vis_dict == sa.vis_dict

    def test_device_batch_cap_preserves_fid_math(self):
        # with an rng-free sampler, sub-batched accumulation is exactly
        # the same math as one big batch
        def sample_const(static, payload, rng, batch_idx):
            base = payload["v"][:, 0] / 1000.0 * 2 - 1
            return to_uint8(base[:, None, None, None] * jnp.ones((1, 4, 4, 3)))

        cands = [(500, 1), (450, 2), (990, 3)]
        a = self._fitness(sample_fn=sample_const, max_device_batch=0)(cands)
        b = self._fitness(sample_fn=sample_const, max_device_batch=8)(cands)
        # identical samples; only the f32 moment-accumulation order differs
        np.testing.assert_allclose(a, b, rtol=1e-3)


    def test_static_payload_committed_to_device_once(self):
        """CLI loaders hand host-numpy checkpoint params straight to the
        fitness; without an explicit place_fn they must be committed to
        device at construction (host-numpy jit arguments are re-staged on
        EVERY chunk dispatch — ~1.4 GB per call at full ADM-64 scale)."""
        W = np.ones((4, 4), np.float32)          # host numpy, like a loader
        fit = self._fitness(static_payload=W)
        assert isinstance(fit.static_payload, jax.Array)
        fit2 = self._fitness(static_payload=W,
                             feature_params={"w": np.ones((2,), np.float32)})
        assert isinstance(fit2.feature_params["w"], jax.Array)


class TestEndToEndTinySearch:
    def test_adm_pipeline_runs(self):
        """Tiny UNet + pixel-stub features: full EA loop end to end."""
        from autodiffusion_tpu.models import UNetModel
        m = UNetModel(model_channels=32, out_channels=6, num_res_blocks=1,
                      attention_ds=(2,), channel_mult=(1, 2), num_head_channels=32,
                      num_classes=10)
        x = jnp.zeros((2, 8, 8, 3))
        params = m.init(jax.random.key(0), x, jnp.array([0.0, 1.0]),
                        jnp.array([0, 1]))

        def feature_fn(imgs):
            x = imgs.astype(jnp.float32).reshape(imgs.shape[0], -1)
            return {"pool3": x[:, :16]}

        rng = np.random.RandomState(0)
        ref = FIDStats.from_features(rng.randn(100, 16) * 40 + 127)

        fitness = make_adm_fitness(
            model=m, params=params, image_size=8, feature_fn=feature_fn,
            ref_stats=ref, num_samples=8, batch_size=4, num_classes=10,
            base_schedule="cosine", candidate_chunk=2, seed=0, feature_dim=16)
        sp = TimestepSpace(1000, 4, rng=pyrandom.Random(0))
        s = EvolutionSearcher(sp, fitness, population_num=4, select_num=2,
                              mutation_num=1, crossover_num=1, max_epochs=1)
        best, fid = s.search()
        assert np.isfinite(fid)
        assert len(best) == 4


class TestReviewRegressions:
    def test_continuous_crossover_repairs_duplicates(self):
        import random as pyrandom
        sp = ContinuousTimeSpace.uniform_grid(6, rng=pyrandom.Random(0),
                                              grid_size=50)
        # parents sharing knots would duplicate under a positional mix
        c1 = sp.random()
        c2 = tuple(sorted(c1[:3] + sp.random()[:3]))
        for _ in range(50):
            child = sp.crossover(c1, c2)
            assert len(set(child)) == len(child), child

    def test_checkpoint_resumes_space_rng_and_skip_range(self, tmp_path):
        import random as pyrandom
        from autodiffusion_tpu.search import JointSpace

        def fit(cands):
            return [float(sum(c[0])) for c in cands]

        path = str(tmp_path / "ea.json")
        sp = JointSpace(100, 4, 16, (0.0, 0.0), rng=pyrandom.Random(7))
        s = EvolutionSearcher(sp, fit, population_num=4, select_num=2,
                              mutation_num=1, crossover_num=1, max_epochs=1,
                              checkpoint_path=path)
        s.search()
        sp.skip_layer_range = (0.1, 0.3)       # progressive widening state
        s._save()
        state_after = sp.rng.getstate()

        sp2 = JointSpace(100, 4, 16, (0.0, 0.0), rng=pyrandom.Random(7))
        s2 = EvolutionSearcher(sp2, fit, population_num=4, select_num=2,
                               mutation_num=1, crossover_num=1, max_epochs=1,
                               checkpoint_path=path)
        s2.load()
        assert sp2.rng.getstate() == state_after
        assert sp2.skip_layer_range == (0.1, 0.3)
        # resumed stream continues identically with an uninterrupted one
        assert sp2.random() == sp.random()

    def test_joint_space_terminates_at_full_skip_range(self):
        import random as pyrandom
        from autodiffusion_tpu.search import JointSpace
        sp = JointSpace(50, 4, 10, (1.0, 1.0), rng=pyrandom.Random(0))
        ts, skips = sp.random()     # min_cost == 0: must still terminate
        assert len(ts) <= 50

    def test_joint_space_budget_equal_min_cost_terminates(self):
        """budget == min_cost with integer hi*layer_num: _random_skip's
        truncation could never emit the minimal cost and the rejection
        loop hung forever (round-3 review, reproduced by timeout)."""
        import random as pyrandom

        from autodiffusion_tpu.search import JointSpace
        sp = JointSpace(100, 10, 5, (0.0, 0.5), rng=pyrandom.Random(0))
        for _ in range(10):
            ts, skips = sp.random()
            assert sp.is_feasible((ts, skips))
            assert sp.budget_used(skips) <= 5

    def test_fitness_discloses_actual_sample_count(self):
        fit = TestBatchedFitness()._fitness(num_samples=30, batch_size=16)
        # 30 rounds up to 2 batches of 16
        assert fit.actual_samples == 32
        fit2 = TestBatchedFitness()._fitness(num_samples=32, batch_size=16)
        assert fit2.actual_samples == 32

    def test_cli_maybe_resume_ea(self, tmp_path, capsys):
        """--resume wires EvolutionSearcher.load into the CLI; without it a
        re-run would overwrite ea_state.json and destroy the crashed run's
        memoized FIDs (round-3 review)."""
        import argparse

        from autodiffusion_tpu.cli.main import _maybe_resume_ea

        calls = {"n": 0}

        def fit(cands):
            calls["n"] += len(cands)
            return [float(len(c)) for c in cands]

        ckpt = str(tmp_path / "ea_state.json")

        def mk(path):
            return EvolutionSearcher(
                TimestepSpace(100, 4), fit, population_num=4, select_num=2,
                mutation_num=1, crossover_num=1, max_epochs=1,
                checkpoint_path=path)

        s1 = mk(ckpt)
        s1.search()
        assert (tmp_path / "ea_state.json").exists()

        # --resume True loads the checkpoint, and the restored memo means
        # known candidates are NOT re-paid (the stated point of resume)
        s2 = mk(ckpt)
        _maybe_resume_ea(s2, argparse.Namespace(resume=True))
        assert s2.epoch == s1.epoch and s2.vis_dict == s1.vis_dict
        paid = calls["n"]
        s2._evaluate(list(s2.candidates))
        assert calls["n"] == paid, "resume re-paid memoized fitness"

        # --resume without a checkpoint path fails loud
        with pytest.raises(ValueError, match="save_dir"):
            _maybe_resume_ea(mk(None), argparse.Namespace(resume=True))

        # --resume True with no file yet starts fresh (first run)
        fresh = mk(str(tmp_path / "absent" / "ea_state.json"))
        _maybe_resume_ea(fresh, argparse.Namespace(resume=True))
        assert fresh.epoch == 0 and not fresh.vis_dict

        # no --resume: untouched searcher, plus the logged overwrite note
        capsys.readouterr()
        s4 = mk(ckpt)
        _maybe_resume_ea(s4, argparse.Namespace(resume=False))
        assert s4.epoch == 0 and not s4.vis_dict
        assert "--resume True" in capsys.readouterr().out
