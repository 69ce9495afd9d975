"""ImageDataset augmentation: fresh crop/flip randomness on every access.

Guards the reference's per-access augmentation semantics
(image_datasets.py:96-167): the same index must NOT receive a frozen
crop/flip decision across epochs.
"""

import numpy as np
import pytest

from autodiffusion_tpu.data.images import ImageDataset


@pytest.fixture()
def image_dir(tmp_path):
    PIL = pytest.importorskip("PIL")
    from PIL import Image

    rng = np.random.RandomState(0)
    for i in range(3):
        arr = rng.randint(0, 256, (24, 32, 3), dtype=np.uint8)
        Image.fromarray(arr).save(tmp_path / f"cls{i}_img.png")
    return tmp_path


def _paths(d):
    return sorted(str(p) for p in d.iterdir())


class TestAugmentationFreshness:
    def test_flip_varies_across_epochs(self, image_dir):
        ds = ImageDataset(16, _paths(image_dir), random_flip=True,
                          aug_seed=0)
        # 40 accesses of the same index: both orientations must occur
        outs = [ds[0][0] for _ in range(40)]
        distinct = {a.tobytes() for a in outs}
        assert len(distinct) == 2

    def test_random_crop_varies_across_epochs(self, image_dir):
        ds = ImageDataset(16, _paths(image_dir), random_crop=True,
                          random_flip=False, aug_seed=0)
        outs = [ds[1][0] for _ in range(20)]
        assert len({a.tobytes() for a in outs}) > 1

    def test_deterministic_eval_path_is_stable(self, image_dir):
        ds = ImageDataset(16, _paths(image_dir), random_crop=False,
                          random_flip=False)
        a, b = ds[2][0], ds[2][0]
        np.testing.assert_array_equal(a, b)


def test_random_crop_scale_jitter_on_square_images(tmp_path):
    """Reference random_crop_arr resizes the short side to a RANDOM size in
    [res, ceil(res/0.8)] before cropping; without the jitter a square
    source degenerates to a deterministic (0,0) crop with zero
    augmentation (image_datasets.py:276-296)."""
    from PIL import Image

    from autodiffusion_tpu.data.images import ImageDataset

    rng = np.random.RandomState(0)
    p = tmp_path / "img_0.png"
    Image.fromarray(rng.randint(0, 255, (64, 64, 3), np.uint8)).save(p)
    ds = ImageDataset(resolution=32, paths=[str(p)], random_crop=True,
                      random_flip=False)
    crops = {ds[0][0].tobytes() for _ in range(12)}
    assert len(crops) > 1, "random_crop produced identical crops on a square image"
