"""Noisy-classifier training step (classifier_train.py parity)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autodiffusion_tpu.models import EncoderUNetModel
from autodiffusion_tpu.schedules import build_base_tables
from autodiffusion_tpu.train import create_train_state, make_classifier_train_step


pytestmark = pytest.mark.slow

class TestClassifierTrain:
    def test_loss_decreases_on_separable_data(self):
        clf = EncoderUNetModel(model_channels=32, out_channels=2,
                               num_res_blocks=1, attention_ds=(2,),
                               channel_mult=(1, 2), num_head_channels=32,
                               pool="attention")
        x0 = jnp.zeros((4, 8, 8, 3))
        params = clf.init(jax.random.key(0), x0, jnp.zeros((4,)))
        state = create_train_state(params, lr=3e-4)
        step = jax.jit(make_classifier_train_step(clf.apply, noised=True))
        tables = build_base_tables("cosine", 1000)

        rng = np.random.RandomState(0)
        # trivially separable: class = sign of mean pixel
        x = np.concatenate([np.full((8, 8, 8, 3), 0.8),
                            np.full((8, 8, 8, 3), -0.8)]).astype(np.float32)
        y = np.array([0] * 8 + [1] * 8)
        losses = []
        for i in range(12):
            t = rng.randint(0, 50, 16)   # low noise so the signal survives
            state, m = step(state, tables,
                            {"x": jnp.asarray(x), "y": jnp.asarray(y)},
                            jnp.asarray(t), jax.random.key(i))
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0]
        assert float(m["acc@1"]) >= 0.5
