"""Native C++ data runtime: npy mmap, batch assembly, prefetch."""

import os

import numpy as np
import pytest

from autodiffusion_tpu.data.native_loader import NativeNpyLoader, native_available

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native lib unavailable (no g++?)")


@pytest.fixture()
def npy_pair(tmp_path):
    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 256, (64, 16, 16, 3), dtype=np.uint8)
    labels = rng.randint(0, 10, 64).astype(np.int64)
    ip, lp = str(tmp_path / "i.npy"), str(tmp_path / "l.npy")
    np.save(ip, imgs)
    np.save(lp, labels)
    return ip, lp, imgs, labels


def roundtrip(x):
    return np.round((x + 1) * 127.5).astype(np.uint8)


class TestNativeLoader:
    def test_deterministic_order_and_values(self, npy_pair):
        ip, lp, imgs, labels = npy_pair
        ld = NativeNpyLoader(ip, lp, batch_size=4, random_flip=False,
                             shuffle=False, num_workers=1)
        b1, b2 = next(ld), next(ld)
        assert np.array_equal(roundtrip(b1["x"]), imgs[:4])
        assert np.array_equal(roundtrip(b2["x"]), imgs[4:8])
        assert np.array_equal(b1["y"], labels[:4])
        ld.close()

    def test_center_crop(self, npy_pair):
        ip, _, imgs, _ = npy_pair
        ld = NativeNpyLoader(ip, None, batch_size=2, crop=8, random_flip=False,
                             shuffle=False, num_workers=1)
        b = next(ld)
        assert np.array_equal(roundtrip(b["x"]), imgs[:2, 4:12, 4:12])
        ld.close()

    def test_shuffle_covers_epoch(self, npy_pair):
        ip, _, imgs, _ = npy_pair
        ld = NativeNpyLoader(ip, None, batch_size=8, random_flip=False,
                             shuffle=True, seed=3, num_workers=1)
        seen = set()
        for _ in range(8):       # one epoch
            b = next(ld)
            for img in roundtrip(b["x"]):
                # identify row by its first pixel triple (unique enough)
                seen.add(bytes(img[0, 0].tolist()))
        assert len(seen) > 50    # near-full coverage of 64 distinct images
        ld.close()

    def test_multiworker_prefetch_throughput(self, npy_pair):
        ip, _, _, _ = npy_pair
        ld = NativeNpyLoader(ip, None, batch_size=8, num_workers=4, prefetch=4)
        for _ in range(100):
            b = next(ld)
        assert b["x"].shape == (8, 16, 16, 3)
        ld.close()

    def test_missing_file_raises(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            NativeNpyLoader(str(tmp_path / "nope.npy"), None, batch_size=2)


class TestLoaderValidation:
    def test_invalid_configs_refused(self, tmp_path):
        """Out-of-bounds configs must fail loudly, not read past the mmap:
        batch > N, crop > H/W, and non-uint8 arrays (fill_batch addresses
        pixels in 1-byte units)."""
        import numpy as np
        import pytest

        from autodiffusion_tpu.data.native_loader import NativeNpyLoader

        p = str(tmp_path / "imgs.npy")
        np.save(p, np.zeros((10, 16, 16, 3), np.uint8))
        with pytest.raises(ValueError):
            NativeNpyLoader(p, batch_size=64)          # batch > N
        with pytest.raises(ValueError):
            NativeNpyLoader(p, batch_size=4, crop=32)  # crop > H
        pf = str(tmp_path / "f.npy")
        np.save(pf, np.zeros((10, 16, 16, 3), np.float32))
        with pytest.raises(ValueError):
            NativeNpyLoader(pf, batch_size=4)          # not uint8
