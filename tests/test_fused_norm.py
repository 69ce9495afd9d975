"""Fused GroupNorm(+FiLM)+SiLU kernel vs the pure-jnp reference.

Runs the Pallas kernels in interpret mode (CPU) and checks forward values
and every cotangent (dx, dgamma, dbeta, dscale, dshift) against jax.grad of
group_norm_reference, across the channel/token shapes the ADM and SD UNets
actually use (C = 192/384/576 at N = 4096/1024/64, plus a small-C edge).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autodiffusion_tpu.ops.fused_norm import (fused_group_norm,
                                              fused_norm_available,
                                              group_norm_reference)

SHAPES = [
    # (B, N, C) — ADM-64 levels and the SD 512px latent level
    (2, 4096, 192),
    (3, 1024, 384),
    (2, 64, 576),
    (2, 7, 16),     # C < 32 -> groups = C
]


def _mk(shape, key, dtype=jnp.float32, film=True):
    b, n, c = shape
    ks = jax.random.split(key, 5)
    x = jax.random.normal(ks[0], (b, n, c), dtype)
    gamma = jax.random.normal(ks[1], (c,), jnp.float32) * 0.2 + 1.0
    beta = jax.random.normal(ks[2], (c,), jnp.float32) * 0.1
    scale = jax.random.normal(ks[3], (b, c), dtype) * 0.3 if film else None
    shift = jax.random.normal(ks[4], (b, c), dtype) * 0.3 if film else None
    return x, gamma, beta, scale, shift


@pytest.mark.parametrize("shape", SHAPES)
@pytest.mark.parametrize("film,act", [(True, "silu"), (False, "silu"),
                                      (False, "none"), (True, "none")])
def test_forward_matches_reference(shape, film, act):
    x, gamma, beta, scale, shift = _mk(shape, jax.random.key(0), film=film)
    got = fused_group_norm(x, gamma, beta, scale=scale, shift=shift,
                           act=act, interpret=True)
    want = group_norm_reference(x, gamma, beta, scale=scale, shift=shift,
                                act=act)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("shape", SHAPES[:3])
def test_grads_match_reference(shape):
    x, gamma, beta, scale, shift = _mk(shape, jax.random.key(1))

    def loss_fused(x, gamma, beta, scale, shift):
        y = fused_group_norm(x, gamma, beta, scale=scale, shift=shift,
                             act="silu", interpret=True)
        return jnp.sum(jnp.sin(y))

    def loss_ref(x, gamma, beta, scale, shift):
        y = group_norm_reference(x, gamma, beta, scale=scale, shift=shift,
                                 act="silu")
        return jnp.sum(jnp.sin(y))

    got = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(
        x, gamma, beta, scale, shift)
    want = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(
        x, gamma, beta, scale, shift)
    names = ["dx", "dgamma", "dbeta", "dscale", "dshift"]
    for name, a, b in zip(names, got, want):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4, err_msg=name)


def test_grads_no_film_act_none():
    x, gamma, beta, _, _ = _mk((2, 256, 128), jax.random.key(2), film=False)

    def loss(fn):
        def inner(x, gamma, beta):
            return jnp.sum(jnp.cos(fn(x, gamma, beta)))
        return inner

    fused = loss(lambda x, g, b: fused_group_norm(
        x, g, b, act="none", interpret=True))
    ref = loss(lambda x, g, b: group_norm_reference(x, g, b, act="none"))
    got = jax.grad(fused, argnums=(0, 1, 2))(x, gamma, beta)
    want = jax.grad(ref, argnums=(0, 1, 2))(x, gamma, beta)
    for a, b in zip(got, want):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4)


def test_bf16_input():
    x, gamma, beta, scale, shift = _mk((2, 1024, 192), jax.random.key(3),
                                       dtype=jnp.bfloat16)
    got = fused_group_norm(x, gamma, beta, scale=scale, shift=shift,
                           act="silu", interpret=True)
    assert got.dtype == jnp.bfloat16
    want = group_norm_reference(x, gamma, beta, scale=scale, shift=shift,
                                act="silu")
    np.testing.assert_allclose(got.astype(np.float32),
                               want.astype(np.float32), rtol=2e-2, atol=2e-2)


def test_nhwc_wrapper_shape():
    x = jax.random.normal(jax.random.key(4), (2, 8, 8, 64))
    gamma = jnp.ones((64,))
    beta = jnp.zeros((64,))
    y = fused_group_norm(x, gamma, beta, act="none", interpret=True)
    assert y.shape == x.shape
    want = group_norm_reference(x, gamma, beta, act="none")
    np.testing.assert_allclose(y, want, rtol=1e-5, atol=1e-5)


def test_reference_matches_flax_groupnorm():
    """group_norm_reference (the kernel's spec) == flax nn.GroupNorm."""
    from flax import linen as nn
    x = jax.random.normal(jax.random.key(5), (3, 16, 16, 96))
    gn = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=jnp.float32)
    params = gn.init(jax.random.key(6), x)
    gamma = params["params"]["scale"]
    beta = params["params"]["bias"]
    want = gn.apply(params, x)
    got = group_norm_reference(x, gamma, beta, act="none")
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_availability_gate(monkeypatch):
    # opt-in: off unless ADT_FUSED_NORM=1
    monkeypatch.delenv("ADT_FUSED_NORM", raising=False)
    assert not fused_norm_available((2, 64, 64, 192))
    monkeypatch.setenv("ADT_FUSED_NORM", "1")
    # ... and even then TPU-backend-only with a VMEM size cap
    if jax.default_backend() == "tpu":
        assert fused_norm_available((2, 64, 64, 192))
        assert not fused_norm_available((1, 512, 512, 128))  # VMEM cap
    else:
        assert not fused_norm_available((2, 64, 64, 192))


def test_resblock_fused_norm_matches_default():
    """ResBlock(fused_norm=True) (Pallas kernel, interpret off-TPU) agrees
    with the default XLA composition — the classifier's opt-in path."""
    from autodiffusion_tpu.models.unet import ResBlock
    x = jax.random.normal(jax.random.key(7), (2, 8, 8, 64))
    emb = jax.random.normal(jax.random.key(8), (2, 32))
    blk = ResBlock(out_channels=64)
    blk_fused = ResBlock(out_channels=64, fused_norm=True)
    p = blk.init(jax.random.key(9), x, emb)
    want = blk.apply(p, x, emb)
    got = blk_fused.apply(p, x, emb)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
    gw = jax.grad(lambda x: jnp.sum(jnp.sin(blk.apply(p, x, emb))))(x)
    gg = jax.grad(lambda x: jnp.sum(jnp.sin(blk_fused.apply(p, x, emb))))(x)
    np.testing.assert_allclose(gg, gw, rtol=5e-4, atol=5e-4)
