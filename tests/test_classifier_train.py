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


class TestClassifierTrainCLI:
    def test_train_classifier_subcommand_end_to_end(self, tmp_path):
        """adt train-classifier smoke: trains, saves, and resumes
        (scripts/classifier_train.py parity at the CLI layer)."""
        PIL = pytest.importorskip("PIL")
        from PIL import Image

        from autodiffusion_tpu.cli.main import main

        data = tmp_path / "imgs"
        data.mkdir()
        rng = np.random.RandomState(0)
        for i in range(8):
            arr = rng.randint(0, 256, (32, 32, 3), dtype=np.uint8)
            Image.fromarray(arr).save(data / f"cls{i % 2}_im{i}.png")
        save = str(tmp_path / "ckpt")
        args = ["train-classifier", "--data_dir", str(data),
                "--image_size", "32", "--classifier_width", "32",
                "--classifier_depth", "1",
                "--classifier_attention_resolutions", "16",
                "--batch_size", "8", "--num_classes", "2",
                "--save_interval", "2", "--save_dir", save,
                "--log_interval", "1"]
        assert main(args + ["--iterations", "2"]) == 0
        import os
        assert "model000002.msgpack" in os.listdir(save)
        # resume continues the step counter
        assert main(args + ["--iterations", "3",
                            "--resume_checkpoint", save]) == 0
        assert "model000003.msgpack" in os.listdir(save)
