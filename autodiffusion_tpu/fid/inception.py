"""FID InceptionV3 feature extractor in flax (NHWC).

On-device replacement for both of the reference's FID backends — the frozen
TF1 InceptionV3 graph (evaluations/evaluator_v1.py:160-175,665-679) and
pytorch_fid's InceptionV3 (sd/scripts/search_ea.py:43,171-182). Architecture
follows the pytorch_fid variant of torchvision InceptionV3 (the standard
"pt_inception-2015-12-05" FID weights): BasicConv2d = conv + BN(eps 1e-3) +
relu (BN folded into conv at load time), FID-specific pooling quirks
(count_include_pad=False average pools; max-pool branch in the second
InceptionE block), and a 1008-way TF-label fc head for Inception Score.

Weights are NOT bundled (this environment has no network); supply the
standard ``pt_inception-2015-12-05-6726825d.pth`` via
``load_fid_inception_params(path)``. All downstream components
(FID evaluator, search fitness) take an opaque ``feature_fn`` and work with
any extractor.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

__all__ = ["FIDInceptionV3", "load_fid_inception_params", "preprocess",
           "random_params"]


def _avg_pool_3x3_cif(x: jnp.ndarray) -> jnp.ndarray:
    """3x3 stride-1 avg pool with count_include_pad=False (pytorch_fid)."""
    ones = jnp.ones(x.shape[1:3], x.dtype)[None, :, :, None]
    sum_ = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
                                 [(0, 0), (1, 1), (1, 1), (0, 0)])
    cnt = jax.lax.reduce_window(ones, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
                                [(0, 0), (1, 1), (1, 1), (0, 0)])
    return sum_ / cnt


def _max_pool(x, window=3, stride=2, pad=0):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, window, window, 1), (1, stride, stride, 1),
        [(0, 0), (pad, pad), (pad, pad), (0, 0)])


class BasicConv2d(nn.Module):
    """Conv with folded batchnorm + relu."""

    features: int
    kernel: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Any = ((0, 0), (0, 0))

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, self.kernel, strides=self.strides,
                    padding=self.padding, use_bias=True, name="conv")(x)
        return nn.relu(x)


def _p(v):
    if isinstance(v, int):
        return ((v, v), (v, v))
    return ((v[0], v[0]), (v[1], v[1]))


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=_p(2), name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=_p(1), name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=_p(1), name="branch3x3dbl_3")(b3)
        bp = _avg_pool_3x3_cif(x)
        bp = BasicConv2d(self.pool_features, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), strides=(2, 2), name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=_p(1), name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), strides=(2, 2), name="branch3x3dbl_3")(bd)
        bp = _max_pool(x)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = BasicConv2d(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=_p((0, 3)), name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=_p((3, 0)), name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=_p((3, 0)), name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=_p((0, 3)), name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=_p((3, 0)), name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=_p((0, 3)), name="branch7x7dbl_5")(bd)
        bp = _avg_pool_3x3_cif(x)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), strides=(2, 2), name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=_p((0, 3)), name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=_p((3, 0)), name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), strides=(2, 2), name="branch7x7x3_4")(b7)
        bp = _max_pool(x)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    pool_type: str = "avg"   # "max" in the last block (FID quirk)

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1")(x)
        b3 = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=_p((0, 1)), name="branch3x3_2a")(b3),
            BasicConv2d(384, (3, 1), padding=_p((1, 0)), name="branch3x3_2b")(b3),
        ], axis=-1)
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=_p(1), name="branch3x3dbl_2")(bd)
        bd = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=_p((0, 1)), name="branch3x3dbl_3a")(bd),
            BasicConv2d(384, (3, 1), padding=_p((1, 0)), name="branch3x3dbl_3b")(bd),
        ], axis=-1)
        if self.pool_type == "avg":
            bp = _avg_pool_3x3_cif(x)
        else:
            bp = _max_pool(x, window=3, stride=1, pad=1)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class FIDInceptionV3(nn.Module):
    """Returns dict(pool3 [B,2048], spatial [B,17,17,7], logits [B,1008])."""

    num_logits: int = 1008

    @nn.compact
    def __call__(self, x):
        x = BasicConv2d(32, (3, 3), strides=(2, 2), name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=_p(1), name="Conv2d_2b_3x3")(x)
        x = _max_pool(x)
        x = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = _max_pool(x)
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        # spatial features for sFID: first 7 channels of the 17x17 grid
        # (analog of the TF graph's mixed_6/conv:0 head,
        # evaluator_v1.py:665-679)
        spatial = x[..., :7]
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE("avg", name="Mixed_7b")(x)
        x = InceptionE("max", name="Mixed_7c")(x)
        pool3 = x.mean(axis=(1, 2))
        logits = nn.Dense(self.num_logits, name="fc")(pool3)
        return {"pool3": pool3, "spatial": spatial, "logits": logits}


def preprocess(images_uint8: jnp.ndarray, size: int = 299) -> jnp.ndarray:
    """uint8 NHWC [0,255] -> float32 [-1,1] resized to 299 (bilinear,
    half-pixel centers — torch interpolate align_corners=False semantics).

    antialias=False is load-bearing: pytorch_fid's F.interpolate does NOT
    antialias, and jax.image.resize defaults to antialias=True on
    downsampling — for 512px SD outputs that diverges by up to ~0.5 on
    the [0,1] scale (vs ~3e-6 without), which would silently shift every
    SD FID away from the reference implementation."""
    x = images_uint8.astype(jnp.float32) / 255.0
    b, h, w, c = x.shape
    if (h, w) != (size, size):
        x = jax.image.resize(x, (b, size, size, c), method="bilinear",
                             antialias=False)
    return x * 2.0 - 1.0


def _fold_bn(conv_w, bn_g, bn_b, bn_m, bn_v, eps=1e-3):
    """Fold BN into conv: torch conv [out,in,kh,kw] -> flax [kh,kw,in,out]."""
    scale = bn_g / np.sqrt(bn_v + eps)
    w = conv_w * scale[:, None, None, None]
    b = bn_b - bn_m * scale
    return {"kernel": w.transpose(2, 3, 1, 0), "bias": b}


def load_fid_inception_params(path: str) -> dict:
    """Load the standard pytorch_fid checkpoint
    (``pt_inception-2015-12-05-6726825d.pth``) into flax params."""
    import torch

    sd = {k: v.numpy() for k, v in torch.load(path, map_location="cpu").items()}

    def conv(prefix):
        return _fold_bn(sd[f"{prefix}.conv.weight"], sd[f"{prefix}.bn.weight"],
                        sd[f"{prefix}.bn.bias"], sd[f"{prefix}.bn.running_mean"],
                        sd[f"{prefix}.bn.running_var"])

    params: dict = {}
    for name in ["Conv2d_1a_3x3", "Conv2d_2a_3x3", "Conv2d_2b_3x3",
                 "Conv2d_3b_1x1", "Conv2d_4a_3x3"]:
        params[name] = {"conv": conv(name)}

    def fill(block, branches):
        params[block] = {br: {"conv": conv(f"{block}.{br}")} for br in branches}

    a_branches = ["branch1x1", "branch5x5_1", "branch5x5_2", "branch3x3dbl_1",
                  "branch3x3dbl_2", "branch3x3dbl_3", "branch_pool"]
    for blk in ["Mixed_5b", "Mixed_5c", "Mixed_5d"]:
        fill(blk, a_branches)
    fill("Mixed_6a", ["branch3x3", "branch3x3dbl_1", "branch3x3dbl_2",
                      "branch3x3dbl_3"])
    c_branches = ["branch1x1", "branch7x7_1", "branch7x7_2", "branch7x7_3",
                  "branch7x7dbl_1", "branch7x7dbl_2", "branch7x7dbl_3",
                  "branch7x7dbl_4", "branch7x7dbl_5", "branch_pool"]
    for blk in ["Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"]:
        fill(blk, c_branches)
    fill("Mixed_7a", ["branch3x3_1", "branch3x3_2", "branch7x7x3_1",
                      "branch7x7x3_2", "branch7x7x3_3", "branch7x7x3_4"])
    e_branches = ["branch1x1", "branch3x3_1", "branch3x3_2a", "branch3x3_2b",
                  "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3a",
                  "branch3x3dbl_3b", "branch_pool"]
    for blk in ["Mixed_7b", "Mixed_7c"]:
        fill(blk, e_branches)
    params["fc"] = {"kernel": sd["fc.weight"].T, "bias": sd["fc.bias"]}
    return {"params": params}


def random_params(rng=None, size: int = 75) -> dict:
    """Random-init params (architecture smoke tests / mock fitness only)."""
    model = FIDInceptionV3()
    rng = rng if rng is not None else jax.random.key(0)
    return model.init(rng, jnp.zeros((1, size, size, 3)))
