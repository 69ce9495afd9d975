"""Numerical parity of the flax FID InceptionV3 vs a torch mirror.

The real pt_inception-2015-12-05 weights are unavailable offline, so this
builds an independent torch implementation of the pytorch_fid InceptionV3
graph (BasicConv2d = conv+BN(eps 1e-3)+relu, count_include_pad=False average
pools, max-pool branch in Mixed_7c), loads a RANDOM synthesized checkpoint
into BOTH sides (torch via strict state_dict load — which also certifies the
key layout is exactly pytorch_fid's — flax via load_fid_inception_params),
and asserts pool3/spatial/logits agree to ~1e-4 relative on uint8 batches of
several input sizes, including the resize path.

Certifies the search fitness backbone: a silent architecture/pool/pad/BN-fold
bug here would invalidate every FID ranking. Reference:
evaluations/evaluator_v1.py:160-175,665-679 (TF backend),
sd/scripts/search_ea.py:95-182 (pytorch_fid backend).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autodiffusion_tpu.fid import (FIDInceptionV3, load_fid_inception_params,
                                   preprocess)
from test_inception_loader import synthesize_torch_state

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

# the torch mirror lives in the package so `adt selftest` can reuse it
# with REAL weights (fid/torch_mirror.py); this test certifies the flax
# network against it with a synthesized checkpoint
from autodiffusion_tpu.fid.torch_mirror import (build_torch_mirror,  # noqa: E402
                                                load_mirror_state)

pytestmark = pytest.mark.slow


def _rel_err(a, b):
    a, b = np.asarray(a), np.asarray(b)
    return np.abs(a - b).max() / max(1.0, np.abs(b).max())


@pytest.fixture(scope="module")
def paired_models(tmp_path_factory):
    """(flax_params, torch_model) loaded from one random synthesized ckpt."""
    model = FIDInceptionV3()
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.key(0), jnp.zeros((1, 299, 299, 3))))
    sd = synthesize_torch_state(
        jax.tree_util.tree_map(lambda s: np.zeros(s.shape, s.dtype), shapes),
        np.random.RandomState(7))
    path = str(tmp_path_factory.mktemp("fid") / "pt_inception_fake.pth")
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, path)

    # load_mirror_state raises on any layout mismatch beyond the
    # num_batches_tracked BN buffers a real pytorch_fid checkpoint lacks
    tmodel = load_mirror_state(build_torch_mirror(), path)

    return load_fid_inception_params(path), tmodel


class TestInceptionParity:
    @pytest.mark.parametrize("in_size", [64, 256, 299, 512])
    def test_forward_matches_torch_mirror(self, paired_models, in_size):
        """uint8 batch -> resize-to-299 preprocess -> all three heads agree.

        512 covers the DOWNSAMPLING path (SD outputs): pytorch_fid's
        F.interpolate does not antialias, so preprocess must pass
        antialias=False or features diverge by ~0.5 in pixel space."""
        fparams, tmodel = paired_models
        rng = np.random.RandomState(in_size)
        imgs = rng.randint(0, 256, (2, in_size, in_size, 3), dtype=np.uint8)

        x = preprocess(jnp.asarray(imgs))
        out = jax.jit(FIDInceptionV3().apply)(fparams, x)

        tx = torch.from_numpy(imgs.transpose(0, 3, 1, 2)).float() / 255.0
        if in_size != 299:
            tx = F.interpolate(tx, size=(299, 299), mode="bilinear",
                               align_corners=False)
        tx = tx * 2.0 - 1.0
        with torch.no_grad():
            tout = tmodel(tx)

        assert _rel_err(out["pool3"], tout["pool3"].numpy()) < 1e-4
        assert _rel_err(out["logits"], tout["logits"].numpy()) < 1e-4
        assert _rel_err(out["spatial"],
                        tout["spatial"].numpy().transpose(0, 2, 3, 1)) < 1e-4


class TestSelftestCLI:
    def test_selftest_with_synthesized_weights(self, paired_models,
                                               tmp_path_factory, capsys):
        """`adt selftest` on a synthesized checkpoint: every consistency
        check passes (feature parity, FID reproduction vs the
        pytorch_fid-style computation) but certified stays false because
        the sha256 is not the genuine pt_inception digest. The day real
        weights exist, the same command flips certified to true."""
        import json

        from autodiffusion_tpu.cli.main import main

        # reuse the synthesized ckpt written by the paired_models fixture
        path = None
        for d in tmp_path_factory.getbasetemp().glob("fid*/pt_inception_fake.pth"):
            path = str(d)
        assert path is not None
        # an 8-image fixture has rank-deficient 2048-dim covariance by
        # construction; scipy's sqrtm warning is inherent, not a defect
        import warnings

        from scipy.linalg import LinAlgWarning

        with warnings.catch_warnings():
            warnings.simplefilter("ignore", LinAlgWarning)
            rc = main(["selftest", "--inception_path", path,
                       "--n_fixture", "8", "--batch_size", "4"])
        out = capsys.readouterr().out.strip().splitlines()[-1]
        got = json.loads(out)
        assert rc == 0, got
        assert got["passed"] is True
        assert got["certified"] is False
        assert got["checks"]["feature_parity_299"]["ok"]
        assert got["checks"]["feature_parity_64"]["ok"]
        assert got["checks"]["fid_reproduction"]["ok"], got["checks"]

    def test_selftest_rejects_lone_ref_batch(self, paired_models,
                                             tmp_path_factory, tmp_path):
        """--ref_batch without --ref_stats (and vice versa) must error
        rather than silently skipping the published-artifact check."""
        import numpy as np
        import pytest

        from autodiffusion_tpu.fid.selftest import run_selftest

        path = None
        for d in tmp_path_factory.getbasetemp().glob("fid*/pt_inception_fake.pth"):
            path = str(d)
        assert path is not None
        rb = str(tmp_path / "rb.npz")
        np.savez(rb, arr_0=np.zeros((4, 64, 64, 3), np.uint8))
        with pytest.raises(ValueError, match="together"):
            run_selftest(path, ref_batch=rb)
        with pytest.raises(ValueError, match="together"):
            run_selftest(path, ref_stats=rb)
