"""Candidate fitness sharded across a (virtual) device mesh.

The reference distributes search sampling by rank + all_gather
(search_imagenet64_classifier_guidance.py:356-366); here the fitness batch
axis simply carries a 'data' sharding and GSPMD splits the whole
sample->feature->moments chunk across the mesh.
"""

import random as pyrandom

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autodiffusion_tpu.fid import FIDStats
from autodiffusion_tpu.models import UNetModel
from autodiffusion_tpu.parallel import data_sharder, make_mesh, replicate
from autodiffusion_tpu.search import TimestepSpace, make_adm_fitness


pytestmark = pytest.mark.slow

class TestShardedFitness:
    def test_fitness_runs_sharded_over_mesh(self):
        assert jax.device_count() == 8
        mesh = make_mesh(model_parallel=1)
        m = UNetModel(model_channels=32, out_channels=6, num_res_blocks=1,
                      attention_ds=(2,), channel_mult=(1, 2),
                      num_head_channels=32, num_classes=10)
        x1 = jnp.zeros((1, 8, 8, 3))
        params = m.init(jax.random.key(0), x1, jnp.zeros((1,)),
                        jnp.zeros((1,), jnp.int32))
        params = replicate(mesh, params)

        def feature_fn(imgs):
            x = imgs.astype(jnp.float32).reshape(imgs.shape[0], -1)
            return {"pool3": x[:, :16]}

        ref = FIDStats.from_features(
            np.random.RandomState(1).randn(100, 16) * 40 + 127)
        fitness = make_adm_fitness(
            model=m, params=params, image_size=8, feature_fn=feature_fn,
            ref_stats=ref, num_samples=16, batch_size=16, num_classes=10,
            base_schedule="cosine", candidate_chunk=2, seed=0,
            feature_dim=16, shard_fn=data_sharder(mesh))
        sp = TimestepSpace(1000, 4, rng=pyrandom.Random(0))
        with mesh:
            fids = fitness([sp.random(), sp.random()])
        assert all(np.isfinite(f) for f in fids)
        assert fids[0] != fids[1]

    def test_sharded_matches_unsharded(self):
        """GSPMD sharding must not change the math."""
        mesh = make_mesh(model_parallel=1)
        m = UNetModel(model_channels=32, out_channels=6, num_res_blocks=1,
                      attention_ds=(2,), channel_mult=(1, 2),
                      num_head_channels=32)
        x1 = jnp.zeros((1, 8, 8, 3))
        params = m.init(jax.random.key(0), x1, jnp.zeros((1,)))

        def feature_fn(imgs):
            x = imgs.astype(jnp.float32).reshape(imgs.shape[0], -1)
            return {"pool3": x[:, :8]}

        ref = FIDStats.from_features(
            np.random.RandomState(2).randn(100, 8) * 40 + 127)

        def build(shard_fn=None, p=params):
            return make_adm_fitness(
                model=m, params=p, image_size=8, feature_fn=feature_fn,
                ref_stats=ref, num_samples=16, batch_size=16,
                num_classes=None, base_schedule="cosine", candidate_chunk=1,
                seed=3, feature_dim=8, shard_fn=shard_fn)

        cand = TimestepSpace(1000, 4, rng=pyrandom.Random(1)).random()
        plain = build()([cand])[0]
        with mesh:
            sharded = build(data_sharder(mesh), replicate(mesh, params))([cand])[0]
        np.testing.assert_allclose(sharded, plain, rtol=1e-4)
