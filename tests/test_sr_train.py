"""SR-pair training mode (scripts/super_res_train.py parity).

Covers the paired-lq ImageDataset crop alignment (image_datasets.py:243-313),
the derived-low_res area downsample (upstream load_superres_data
F.interpolate(mode="area")), make_train_step's low_res threading into
SuperResModel, and the `adt train --sr_small_size` CLI end to end.
"""

import os

import numpy as np
import pytest

from autodiffusion_tpu.data.images import ImageDataset, load_data


def _block_mean(arr: np.ndarray, s: int) -> np.ndarray:
    h, w, c = arr.shape
    return arr.reshape(h // s, s, w // s, s, c).mean(axis=(1, 3))


@pytest.fixture()
def pair_dirs(tmp_path):
    """High-res 32x32 images whose lq partners are exact 4x block means —
    any misaligned crop breaks the blockmean relation, so alignment is
    directly assertable."""
    from PIL import Image

    hi_dir = tmp_path / "hi"
    lq_dir = tmp_path / "lq"
    hi_dir.mkdir()
    lq_dir.mkdir()
    rng = np.random.RandomState(0)
    for i in range(3):
        hi = rng.randint(0, 256, (32, 32, 3)).astype(np.uint8)
        # quantize each 4x4 block to a constant so the uint8 lq partner is
        # EXACTLY the block mean of hi (no rounding residue)
        blocks = hi.reshape(8, 4, 8, 4, 3)[:, 0, :, 0, :]
        hi = np.repeat(np.repeat(blocks, 4, axis=0), 4, axis=1)
        Image.fromarray(hi).save(hi_dir / f"img_{i}.png")
        Image.fromarray(blocks).save(lq_dir / f"img_{i}.png")
    return str(hi_dir), str(lq_dir)


class TestPairedLqDataset:
    def test_sr_pair_crops_stay_aligned(self, pair_dirs):
        """random_crop_arr's "//= with *=" requantization
        (image_datasets.py:301-313): every crop origin lands on the lq
        grid, so lq == blockmean(hi) holds for every access/flip."""
        hi_dir, lq_dir = pair_dirs
        paths = sorted(os.path.join(hi_dir, p) for p in os.listdir(hi_dir))
        ds = ImageDataset(16, paths, random_crop=True, random_flip=True,
                          aug_seed=0, lq_dir=lq_dir, small_size=4)
        for _ in range(20):
            hi, cond = ds[0]
            lq = cond["low_res"]
            assert hi.shape == (16, 16, 3) and lq.shape == (4, 4, 3)
            np.testing.assert_allclose(_block_mean(hi, 4), lq, atol=1e-5)

    def test_same_size_pair_crops_identically(self, tmp_path):
        """Same-shape pairs (the fork's low-level-vision case,
        image_datasets.py:263-266) crop at identical coordinates."""
        from PIL import Image

        hi_dir = tmp_path / "hi"
        lq_dir = tmp_path / "lq"
        hi_dir.mkdir()
        lq_dir.mkdir()
        rng = np.random.RandomState(1)
        arr = rng.randint(0, 256, (24, 24, 3), dtype=np.uint8)
        Image.fromarray(arr).save(hi_dir / "a.png")
        Image.fromarray(arr).save(lq_dir / "a.png")   # identical partner
        ds = ImageDataset(16, [str(hi_dir / "a.png")], random_crop=True,
                          random_flip=True, aug_seed=0, lq_dir=str(lq_dir))
        for _ in range(10):
            hi, cond = ds[0]
            np.testing.assert_array_equal(hi, cond["low_res"])

    def test_load_data_batches_low_res(self, pair_dirs):
        hi_dir, lq_dir = pair_dirs
        it = load_data(data_dir=hi_dir, batch_size=3, image_size=16,
                       lq_dir=lq_dir, small_size=4, random_flip=False)
        b = next(it)
        assert b["x"].shape == (3, 16, 16, 3)
        assert b["low_res"].shape == (3, 4, 4, 3)

    def test_non_multiple_small_size_rejected(self, pair_dirs):
        hi_dir, lq_dir = pair_dirs
        with pytest.raises(ValueError, match="integer multiple"):
            ImageDataset(16, [os.path.join(hi_dir, "img_0.png")],
                         lq_dir=lq_dir, small_size=5)


def test_derived_low_res_matches_torch_area_interpolate():
    """_derive_low_res == upstream F.interpolate(mode="area") at integer
    scale (load_superres_data in openai/guided-diffusion, which this fork's
    super_res_train.py:91-101 specializes)."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    from autodiffusion_tpu.cli.main import _derive_low_res

    rng = np.random.RandomState(0)
    x = rng.rand(2, 16, 16, 3).astype(np.float32) * 2 - 1
    got = next(_derive_low_res(iter([{"x": x}]), 4))["low_res"]
    want = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2), (4, 4),
                         mode="area").permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=1e-6)


class TestSRTrainStep:
    def test_train_step_threads_low_res_into_superres_model(self):
        """A batch carrying "low_res" trains SuperResModel; the low-res
        conditioning must actually reach the model (grads nonzero through
        the concat path) and the loss must fall on a learnable task."""
        import jax
        import jax.numpy as jnp

        from autodiffusion_tpu.models import ModelConfig, create_sr_model
        from autodiffusion_tpu.schedules import build_base_tables
        from autodiffusion_tpu.train import create_train_state, make_train_step

        cfg = ModelConfig(image_size=16, num_channels=8, num_res_blocks=1,
                          num_head_channels=4, attention_resolutions="8",
                          channel_mult="1,2", class_cond=False,
                          learn_sigma=False, use_bf16=False)
        sr = create_sr_model(cfg, large_size=16, small_size=8)
        rng = jax.random.key(0)
        params = sr.init(rng, jnp.zeros((1, 16, 16, 3)), jnp.zeros((1,)),
                         jnp.zeros((1, 8, 8, 3)))
        state = create_train_state(params, lr=1e-3)
        from autodiffusion_tpu.samplers import ModelVarType
        step = jax.jit(make_train_step(sr.apply,
                                       var_type=ModelVarType.FIXED_LARGE,
                                       microbatches=2))
        tables = build_base_tables("linear", 50)
        xr = np.random.RandomState(0)
        x = jnp.asarray(xr.rand(4, 16, 16, 3) * 2 - 1, jnp.float32)
        low = jnp.asarray(
            np.asarray(x).reshape(4, 8, 2, 8, 2, 3).mean((2, 4)))
        ts = [jnp.asarray(xr.randint(0, 50, 4)) for _ in range(8)]
        losses = []
        for i, t in enumerate(ts):
            state, m = step(state, tables, {"x": x, "low_res": low}, t,
                            jnp.ones((4,)), jax.random.key(i))
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0]
        # gradient flow through the low_res concat path: an identical run
        # with ZEROED low_res must produce a different loss trace (the
        # conditioning is consumed, not dropped)
        state2 = create_train_state(params, lr=1e-3)
        losses0 = []
        for i, t in enumerate(ts):
            state2, m2 = step(state2, tables,
                              {"x": x, "low_res": jnp.zeros_like(low)}, t,
                              jnp.ones((4,)), jax.random.key(i))
            losses0.append(float(m2["loss"]))
        assert losses != losses0


class TestSRTrainCLI:
    def _base_args(self, tmp_path, data_dir, save):
        return ["train", "--data_dir", str(data_dir), "--save_dir", save,
                "--image_size", "16", "--sr_small_size", "8",
                "--num_channels", "8", "--num_res_blocks", "1",
                "--num_head_channels", "4", "--attention_resolutions", "8",
                "--channel_mult", "1,2", "--class_cond", "False",
                "--learn_sigma", "True", "--use_bf16", "False",
                "--batch_size", "8", "--max_steps", "2",
                "--save_interval", "2", "--log_interval", "1",
                "--dropout", "0.0"]

    def test_sr_train_derived_low_res_end_to_end(self, tmp_path):
        from PIL import Image

        from autodiffusion_tpu.cli.main import main

        data = tmp_path / "imgs"
        data.mkdir()
        rng = np.random.RandomState(0)
        for i in range(8):
            Image.fromarray(rng.randint(0, 256, (16, 16, 3), np.uint8)
                            ).save(data / f"img_{i}.png")
        save = str(tmp_path / "ckpt")
        assert main(self._base_args(tmp_path, data, save)) == 0
        assert "model000002.msgpack" in os.listdir(save)

    def test_sr_train_lq_dir_end_to_end(self, tmp_path):
        from PIL import Image

        from autodiffusion_tpu.cli.main import main

        data = tmp_path / "imgs"
        lq = tmp_path / "lq"
        data.mkdir()
        lq.mkdir()
        rng = np.random.RandomState(0)
        for i in range(8):
            hi = rng.randint(0, 256, (16, 16, 3)).astype(np.uint8)
            Image.fromarray(hi).save(data / f"img_{i}.png")
            Image.fromarray(_block_mean(hi, 2).astype(np.uint8)
                            ).save(lq / f"img_{i}.png")
        save = str(tmp_path / "ckpt")
        args = self._base_args(tmp_path, data, save)
        args += ["--lq_dir", str(lq)]
        assert main(args) == 0
        assert "model000002.msgpack" in os.listdir(save)

    def test_sr_size_mismatch_fails_loud(self, tmp_path):
        from autodiffusion_tpu.cli.main import main

        with pytest.raises(ValueError, match="multiple"):
            main(["train", "--data_dir", str(tmp_path), "--image_size", "16",
                  "--sr_small_size", "5", "--batch_size", "2"])
