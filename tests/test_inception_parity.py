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
from torch import nn  # noqa: E402

pytestmark = pytest.mark.slow


class TBasicConv2d(nn.Module):
    def __init__(self, cin, cout, **kw):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, bias=False, **kw)
        self.bn = nn.BatchNorm2d(cout, eps=1e-3)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


def _avg_cif(x):
    return F.avg_pool2d(x, 3, stride=1, padding=1, count_include_pad=False)


class TInceptionA(nn.Module):
    def __init__(self, cin, pool_features):
        super().__init__()
        self.branch1x1 = TBasicConv2d(cin, 64, kernel_size=1)
        self.branch5x5_1 = TBasicConv2d(cin, 48, kernel_size=1)
        self.branch5x5_2 = TBasicConv2d(48, 64, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = TBasicConv2d(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = TBasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = TBasicConv2d(96, 96, kernel_size=3, padding=1)
        self.branch_pool = TBasicConv2d(cin, pool_features, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b5 = self.branch5x5_2(self.branch5x5_1(x))
        bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        bp = self.branch_pool(_avg_cif(x))
        return torch.cat([b1, b5, bd, bp], 1)


class TInceptionB(nn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3 = TBasicConv2d(cin, 384, kernel_size=3, stride=2)
        self.branch3x3dbl_1 = TBasicConv2d(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = TBasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = TBasicConv2d(96, 96, kernel_size=3, stride=2)

    def forward(self, x):
        b3 = self.branch3x3(x)
        bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        bp = F.max_pool2d(x, 3, stride=2)
        return torch.cat([b3, bd, bp], 1)


class TInceptionC(nn.Module):
    def __init__(self, cin, c7):
        super().__init__()
        self.branch1x1 = TBasicConv2d(cin, 192, kernel_size=1)
        self.branch7x7_1 = TBasicConv2d(cin, c7, kernel_size=1)
        self.branch7x7_2 = TBasicConv2d(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7_3 = TBasicConv2d(c7, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_1 = TBasicConv2d(cin, c7, kernel_size=1)
        self.branch7x7dbl_2 = TBasicConv2d(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_3 = TBasicConv2d(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7dbl_4 = TBasicConv2d(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_5 = TBasicConv2d(c7, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch_pool = TBasicConv2d(cin, 192, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_5(self.branch7x7dbl_4(self.branch7x7dbl_3(
            self.branch7x7dbl_2(self.branch7x7dbl_1(x)))))
        bp = self.branch_pool(_avg_cif(x))
        return torch.cat([b1, b7, bd, bp], 1)


class TInceptionD(nn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3_1 = TBasicConv2d(cin, 192, kernel_size=1)
        self.branch3x3_2 = TBasicConv2d(192, 320, kernel_size=3, stride=2)
        self.branch7x7x3_1 = TBasicConv2d(cin, 192, kernel_size=1)
        self.branch7x7x3_2 = TBasicConv2d(192, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7x3_3 = TBasicConv2d(192, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7x3_4 = TBasicConv2d(192, 192, kernel_size=3, stride=2)

    def forward(self, x):
        b3 = self.branch3x3_2(self.branch3x3_1(x))
        b7 = self.branch7x7x3_4(self.branch7x7x3_3(self.branch7x7x3_2(
            self.branch7x7x3_1(x))))
        bp = F.max_pool2d(x, 3, stride=2)
        return torch.cat([b3, b7, bp], 1)


class TInceptionE(nn.Module):
    def __init__(self, cin, pool_type):
        super().__init__()
        self.pool_type = pool_type
        self.branch1x1 = TBasicConv2d(cin, 320, kernel_size=1)
        self.branch3x3_1 = TBasicConv2d(cin, 384, kernel_size=1)
        self.branch3x3_2a = TBasicConv2d(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3_2b = TBasicConv2d(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch3x3dbl_1 = TBasicConv2d(cin, 448, kernel_size=1)
        self.branch3x3dbl_2 = TBasicConv2d(448, 384, kernel_size=3, padding=1)
        self.branch3x3dbl_3a = TBasicConv2d(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3dbl_3b = TBasicConv2d(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch_pool = TBasicConv2d(cin, 192, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
        if self.pool_type == "avg":
            bp = _avg_cif(x)
        else:  # FID quirk: Mixed_7c uses a max pool (pytorch_fid FIDInceptionE_2)
            bp = F.max_pool2d(x, 3, stride=1, padding=1)
        bp = self.branch_pool(bp)
        return torch.cat([b1, b3, bd, bp], 1)


class TorchFIDInception(nn.Module):
    def __init__(self):
        super().__init__()
        self.Conv2d_1a_3x3 = TBasicConv2d(3, 32, kernel_size=3, stride=2)
        self.Conv2d_2a_3x3 = TBasicConv2d(32, 32, kernel_size=3)
        self.Conv2d_2b_3x3 = TBasicConv2d(32, 64, kernel_size=3, padding=1)
        self.Conv2d_3b_1x1 = TBasicConv2d(64, 80, kernel_size=1)
        self.Conv2d_4a_3x3 = TBasicConv2d(80, 192, kernel_size=3)
        self.Mixed_5b = TInceptionA(192, 32)
        self.Mixed_5c = TInceptionA(256, 64)
        self.Mixed_5d = TInceptionA(288, 64)
        self.Mixed_6a = TInceptionB(288)
        self.Mixed_6b = TInceptionC(768, 128)
        self.Mixed_6c = TInceptionC(768, 160)
        self.Mixed_6d = TInceptionC(768, 160)
        self.Mixed_6e = TInceptionC(768, 192)
        self.Mixed_7a = TInceptionD(768)
        self.Mixed_7b = TInceptionE(1280, "avg")
        self.Mixed_7c = TInceptionE(2048, "max")
        self.fc = nn.Linear(2048, 1008)

    def forward(self, x):
        x = self.Conv2d_1a_3x3(x)
        x = self.Conv2d_2a_3x3(x)
        x = self.Conv2d_2b_3x3(x)
        x = F.max_pool2d(x, 3, stride=2)
        x = self.Conv2d_3b_1x1(x)
        x = self.Conv2d_4a_3x3(x)
        x = F.max_pool2d(x, 3, stride=2)
        x = self.Mixed_5b(x)
        x = self.Mixed_5c(x)
        x = self.Mixed_5d(x)
        x = self.Mixed_6a(x)
        x = self.Mixed_6b(x)
        x = self.Mixed_6c(x)
        x = self.Mixed_6d(x)
        x = self.Mixed_6e(x)
        spatial = x[:, :7]
        x = self.Mixed_7a(x)
        x = self.Mixed_7b(x)
        x = self.Mixed_7c(x)
        pool3 = x.mean(dim=(2, 3))
        return {"pool3": pool3, "spatial": spatial, "logits": self.fc(pool3)}


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

    tmodel = TorchFIDInception().eval()
    missing, unexpected = tmodel.load_state_dict(
        torch.load(path, map_location="cpu"), strict=False)
    # strict key-layout check: the only keys a real pytorch_fid checkpoint
    # lacks are the num_batches_tracked BN buffers
    assert not unexpected, unexpected
    assert all(k.endswith("num_batches_tracked") for k in missing), missing

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
