"""Implicit-im2col 3x3 conv kernel vs lax.conv / flax nn.Conv.

Runs the Pallas kernel in interpret mode (CPU): forward parity against
jax.lax.conv_general_dilated (the exact op flax nn.Conv lowers to for a
3x3 stride-1 padding-1 NHWC conv), plus the custom_vjp backward against
the XLA conv's own gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autodiffusion_tpu.ops.conv_im2col import (conv3x3, conv3x3_im2col,
                                               _pick_tile_h,
                                               resolve_use_im2col)


def _xla(x, w, bias=None):
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if bias is not None:
        out = out + bias
    return out


SHAPES = [
    # (B, H, W, C_in, C_out, tile_h) — small proxies for the ADM levels
    (2, 8, 8, 24, 16, 4),
    (1, 6, 10, 8, 8, 3),
    (2, 8, 8, 24, 16, None),   # auto tile
    (1, 4, 4, 3, 5, 2),        # non-lane-aligned channels
]


@pytest.mark.parametrize("shape", SHAPES)
@pytest.mark.parametrize("bias", [False, True])
def test_forward_parity(shape, bias):
    b, h, w, cin, cout, th = shape
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    x = jax.random.normal(ks[0], (b, h, w, cin), jnp.float32)
    wk = jax.random.normal(ks[1], (3, 3, cin, cout), jnp.float32) * 0.1
    bk = jax.random.normal(ks[2], (cout,), jnp.float32) if bias else None

    got = conv3x3_im2col(x, wk, bk, tile_h=th, interpret=True)
    want = _xla(x, wk, bk)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_single_row_tiles_edge_halo():
    # tile_h=1 makes every tile an edge or halo-row case: every patch row
    # comes from the above/below halo blocks, never from the main tile;
    # catches off-by-ones in the clamped halo index maps.
    ks = jax.random.split(jax.random.PRNGKey(3), 2)
    x = jax.random.normal(ks[0], (1, 5, 4, 8), jnp.float32)
    wk = jax.random.normal(ks[1], (3, 3, 8, 8), jnp.float32) * 0.1
    got = conv3x3_im2col(x, wk, tile_h=1, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(_xla(x, wk)),
                               rtol=1e-5, atol=1e-5)


def test_whole_image_single_tile():
    # tile_h == H: both halo blocks clamp and must be replaced by the
    # SAME-pad zero rows.
    ks = jax.random.split(jax.random.PRNGKey(4), 2)
    x = jax.random.normal(ks[0], (2, 4, 8, 8), jnp.float32)
    wk = jax.random.normal(ks[1], (3, 3, 8, 8), jnp.float32) * 0.1
    got = conv3x3_im2col(x, wk, tile_h=4, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(_xla(x, wk)),
                               rtol=1e-5, atol=1e-5)


def test_forward_parity_bf16():
    ks = jax.random.split(jax.random.PRNGKey(1), 2)
    x = jax.random.normal(ks[0], (2, 8, 8, 16), jnp.bfloat16)
    wk = (jax.random.normal(ks[1], (3, 3, 16, 16), jnp.float32) * 0.1
          ).astype(jnp.bfloat16)
    got = conv3x3_im2col(x, wk, tile_h=4, interpret=True)
    # Kernel accumulates the dot in f32; compare against an f32 reference
    # with a bf16-level tolerance.
    want = _xla(x.astype(jnp.float32), wk.astype(jnp.float32))
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want), rtol=0.05, atol=0.05)


@pytest.mark.parametrize("bias", [False, True])
def test_custom_vjp_backward(bias):
    ks = jax.random.split(jax.random.PRNGKey(2), 4)
    x = jax.random.normal(ks[0], (1, 4, 6, 8), jnp.float32)
    wk = jax.random.normal(ks[1], (3, 3, 8, 8), jnp.float32) * 0.2
    bk = jax.random.normal(ks[2], (8,), jnp.float32) if bias else None
    g = jax.random.normal(ks[3], (1, 4, 6, 8), jnp.float32)

    def loss_kernel(x_, w_, b_):
        return jnp.sum(conv3x3(x_, w_, b_, 2, True) * g)

    def loss_ref(x_, w_, b_):
        return jnp.sum(_xla(x_, w_, b_) * g)

    if bias:
        got = jax.grad(loss_kernel, argnums=(0, 1, 2))(x, wk, bk)
        want = jax.grad(loss_ref, argnums=(0, 1, 2))(x, wk, bk)
    else:
        got = jax.grad(loss_kernel, argnums=(0, 1))(x, wk, bk)
        want = jax.grad(loss_ref, argnums=(0, 1))(x, wk, bk)
    for a, b_ in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-5)


def test_tile_picker_and_gate():
    # ADM-64 res64: H=64 tiles at 8 rows (512-row patch matrix, <=3MB bf16)
    assert _pick_tile_h(64, 64, 192) == 8
    # res16 at 576 channels: whole-image rows still fit
    th = _pick_tile_h(16, 16, 576)
    assert th is not None and 16 % th == 0
    # gate: off-TPU always False, even when forced
    assert resolve_use_im2col(True, 64, 64, 192, 192) is False
    assert resolve_use_im2col("auto", 64, 64, 192, 192) is False


def test_cout_grid_split():
    # C_out split over the innermost grid dim: patches built at co==0 must
    # persist across the later C_out blocks of the same row tile.
    ks = jax.random.split(jax.random.PRNGKey(11), 2)
    x = jax.random.normal(ks[0], (2, 8, 8, 16), jnp.float32)
    wk = jax.random.normal(ks[1], (3, 3, 16, 24), jnp.float32) * 0.1
    got = conv3x3_im2col(x, wk, tile_h=4, co_block=8, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(_xla(x, wk)),
                               rtol=1e-5, atol=1e-5)


def test_split_k_variant():
    ks = jax.random.split(jax.random.PRNGKey(12), 3)
    x = jax.random.normal(ks[0], (2, 8, 8, 16), jnp.float32)
    wk = jax.random.normal(ks[1], (3, 3, 16, 24), jnp.float32) * 0.1
    bk = jax.random.normal(ks[2], (24,), jnp.float32)
    got = conv3x3_im2col(x, wk, bk, tile_h=4, split_k=True, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(_xla(x, wk, bk)),
                               rtol=1e-5, atol=1e-5)


def test_co_block_picker():
    from autodiffusion_tpu.ops.conv_im2col import _pick_co_block

    # Mosaic legality: blocks must be 128-aligned or the full C_out.
    # SD deep levels bf16: [9*1280, co] budgeted -> 128-wide blocks
    assert _pick_co_block(1280, 1280, 2) == 128
    assert _pick_co_block(640, 640, 2) == 128
    # ADM 192/384: the whole C_out fits in one (alignment-exempt) block
    assert _pick_co_block(192, 192, 2) == 192
    assert _pick_co_block(384, 384, 2) == 384
    # ADM 576: full block (5.97 MB) exceeds the budget and 576 has no
    # 128-multiple divisor -> no legal block; the gate falls back to XLA
    assert _pick_co_block(576, 576, 2) is None
    # f32 at the deepest level: even co=128 exceeds the budget
    assert _pick_co_block(1280, 1280, 4) is None


def test_conv3x3_module_matches_nn_conv():
    # Same init RNG -> identical params (tree paths match nn.Conv), and the
    # fallback forward is bit-identical to flax nn.Conv's lowering.
    from flax import linen as fnn

    from autodiffusion_tpu.models.nn import Conv3x3

    x = jax.random.normal(jax.random.PRNGKey(5), (2, 8, 8, 16), jnp.float32)
    mod = Conv3x3(24)
    ref = fnn.Conv(24, (3, 3), padding=1)
    params = mod.init(jax.random.PRNGKey(7), x)
    params_ref = ref.init(jax.random.PRNGKey(7), x)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        params, params_ref)
    np.testing.assert_array_equal(np.asarray(mod.apply(params, x)),
                                  np.asarray(ref.apply(params_ref, x)))


def test_conv3x3_module_im2col_dispatch(monkeypatch):
    # Force the gate open (it requires a TPU backend normally) and route the
    # kernel through interpret mode: the module's Pallas path must agree
    # with its own fallback.
    import autodiffusion_tpu.ops.conv_im2col as ci
    from autodiffusion_tpu.models.nn import Conv3x3

    x = jax.random.normal(jax.random.PRNGKey(8), (2, 8, 8, 16), jnp.float32)
    mod = Conv3x3(16)
    params = mod.init(jax.random.PRNGKey(9), x)
    want = mod.apply(params, x)

    monkeypatch.setattr(ci, "resolve_use_im2col", lambda *a, **k: True)
    monkeypatch.setattr(
        ci, "conv3x3",
        lambda x_, w_, b_: ci.conv3x3_im2col(x_, w_, b_, interpret=True))
    got = mod.apply(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_gate_shape_bounds(monkeypatch):
    import autodiffusion_tpu.ops.conv_im2col as ci

    monkeypatch.setattr(ci.jax, "default_backend", lambda: "tpu")
    # tiny channel dims idle the MXU
    assert ci.resolve_use_im2col(True, 64, 64, 3, 192) is False
    assert ci.resolve_use_im2col(True, 64, 64, 192, 6) is False
    # no legal C_out block within the weight VMEM budget (absurd c_in)
    assert ci.resolve_use_im2col(True, 8, 8, 40000, 64) is False
    # ADM's 576-channel level: no Mosaic-legal C_out block -> XLA conv
    assert ci.resolve_use_im2col(True, 16, 16, 576, 576) is False
    # ADM/SD hot shapes pass when forced, incl. the co-split deep level
    assert ci.resolve_use_im2col(True, 64, 64, 192, 192) is True
    assert ci.resolve_use_im2col(True, 64, 64, 320, 320) is True
    assert ci.resolve_use_im2col(True, 8, 8, 1280, 1280) is True
    # ...and "auto" follows the env gate AND the measured-winner whitelist:
    # only the SD res64 320-channel shape measured faster than XLA conv
    monkeypatch.delenv("ADT_IM2COL_CONV", raising=False)
    assert ci.resolve_use_im2col("auto", 64, 64, 320, 320) is False
    monkeypatch.setenv("ADT_IM2COL_CONV", "1")
    assert ci.resolve_use_im2col("auto", 64, 64, 320, 320) is True
    # ADM res64 (192 ch) measured SLOWER -> auto never enables it
    assert ci.resolve_use_im2col("auto", 64, 64, 192, 192) is False


def test_bad_shapes_raise():
    x = jnp.zeros((1, 8, 8, 4))
    with pytest.raises(ValueError):
        conv3x3_im2col(x, jnp.zeros((5, 5, 4, 4)), interpret=True)
    with pytest.raises(ValueError):
        conv3x3_im2col(x, jnp.zeros((3, 3, 4, 4)), tile_h=3, interpret=True)


# ---------------- fused norm-act-conv(-residual) (VERDICT r3 #2) ----------


FUSED_SHAPES = [
    # (B, H, W, C_in, C_out, residual, dtype)
    (2, 8, 8, 24, 16, False, jnp.float32),
    (2, 8, 8, 24, 16, True, jnp.float32),
    (1, 6, 10, 8, 8, True, jnp.float32),
    (2, 8, 8, 16, 32, True, jnp.bfloat16),
]


def _fused_operands(shape, key=0):
    b, h, w, cin, cout, res, dt = shape
    ks = jax.random.split(jax.random.PRNGKey(key), 6)
    x = jax.random.normal(ks[0], (b, h, w, cin), dt)
    a = jax.random.uniform(ks[1], (b, cin), jnp.float32, 0.5, 1.5)
    off = jax.random.normal(ks[2], (b, cin), jnp.float32) * 0.1
    wk = jax.random.normal(ks[3], (3, 3, cin, cout), dt) * 0.1
    bk = jax.random.normal(ks[4], (cout,), dt) * 0.1
    r = jax.random.normal(ks[5], (b, h, w, cout), dt) if res else None
    return x, a, off, wk, bk, r


@pytest.mark.parametrize("shape", FUSED_SHAPES)
def test_fused_forward_parity(shape):
    from autodiffusion_tpu.ops.conv_im2col import (_xla_fused_ref,
                                                   conv3x3_fused)

    x, a, off, wk, bk, r = _fused_operands(shape)
    got = conv3x3_fused(x, a, off, wk, bk, r, None, True)
    want = _xla_fused_ref(x, a, off, wk, bk, r)
    tol = 5e-2 if x.dtype == jnp.bfloat16 else 1e-5
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=tol, atol=tol)


def test_fused_single_row_tiles_edge_halo():
    # tile_h=1: every patch row comes through the halo blocks — the
    # transform must be applied to the halo rows too, not just main
    from autodiffusion_tpu.ops.conv_im2col import (_xla_fused_ref,
                                                   conv3x3_fused)

    x, a, off, wk, bk, r = _fused_operands((1, 5, 4, 8, 8, True,
                                            jnp.float32), key=3)
    got = conv3x3_fused(x, a, off, wk, bk, r, 1, True)
    want = _xla_fused_ref(x, a, off, wk, bk, r)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("res", [False, True])
def test_fused_grads_match_xla_composition(res):
    from autodiffusion_tpu.ops.conv_im2col import (_xla_fused_ref,
                                                   conv3x3_fused)

    x, a, off, wk, bk, r = _fused_operands((2, 8, 8, 16, 16, res,
                                            jnp.float32), key=5)
    args = (x, a, off, wk, bk) + ((r,) if res else ())

    def f_fused(*ags):
        xr = ags[5] if res else None
        return conv3x3_fused(ags[0], ags[1], ags[2], ags[3], ags[4], xr,
                             None, True).sum()

    def f_ref(*ags):
        xr = ags[5] if res else None
        return _xla_fused_ref(ags[0], ags[1], ags[2], ags[3], ags[4],
                              xr).sum()

    gf = jax.grad(f_fused, argnums=tuple(range(len(args))))(*args)
    gr = jax.grad(f_ref, argnums=tuple(range(len(args))))(*args)
    for p, q in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(p), np.asarray(q),
                                   rtol=1e-5, atol=1e-5)


def test_groupnorm_affine_fold_matches_norm():
    # GN(x)*(1+scale)+shift == x*a + b for GroupNorm32(return_affine=True)
    from autodiffusion_tpu.models.nn import GroupNorm32

    x = jax.random.normal(jax.random.PRNGKey(11), (2, 6, 6, 16),
                          jnp.float32)
    scale = jax.random.normal(jax.random.PRNGKey(12), (2, 16)) * 0.2
    shift = jax.random.normal(jax.random.PRNGKey(13), (2, 16)) * 0.2
    gn = GroupNorm32(num_groups=4, use_fused=False)
    params = gn.init(jax.random.PRNGKey(14), x)
    # make gamma/beta non-trivial
    params = jax.tree_util.tree_map(
        lambda t: t + 0.3 * jax.random.normal(jax.random.PRNGKey(15),
                                              t.shape), params)
    want = gn.apply(params, x, scale=scale, shift=shift)
    a, off = gn.apply(params, x, scale=scale, shift=shift,
                      return_affine=True)
    got = x * a[:, None, None, :] + off[:, None, None, :]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_conv3x3_module_fused_dispatch(monkeypatch):
    # the module's Pallas fused path (gate forced open, interpret mode)
    # must agree with its own XLA fallback
    import autodiffusion_tpu.ops.conv_im2col as ci
    from autodiffusion_tpu.models.nn import Conv3x3

    x, a, off, _, _, r = _fused_operands((2, 8, 8, 16, 16, True,
                                          jnp.float32), key=7)
    mod = Conv3x3(16)
    params = mod.init(jax.random.PRNGKey(16), x)
    want = mod.apply(params, x, affine=(a, off), residual=r)

    monkeypatch.setattr(ci, "resolve_use_fused_conv", lambda *a_, **k: True)
    monkeypatch.setattr(
        ci, "conv3x3_fused",
        lambda x_, a_, b_, w_, bias_, r_: ci._conv3x3_fused_impl(
            x_, a_, b_, w_, bias_, r_, interpret=True))
    got = mod.apply(params, x, affine=(a, off), residual=r)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_resblock_fused_path_matches_default(monkeypatch):
    # ResBlock with the fused gate forced open (XLA-fallback fused math on
    # CPU) vs the stock composition: f32 end to end, so the only
    # difference is the affine fold's associativity
    import autodiffusion_tpu.models.unet as unet_mod
    from autodiffusion_tpu.models.unet import ResBlock

    x = jax.random.normal(jax.random.PRNGKey(20), (2, 8, 8, 32),
                          jnp.float32)
    emb = jax.random.normal(jax.random.PRNGKey(21), (2, 64), jnp.float32)
    blk = ResBlock(out_channels=32, use_scale_shift_norm=True, dropout=0.0)
    params = blk.init(jax.random.PRNGKey(22), x, emb)
    want = blk.apply(params, x, emb)

    import autodiffusion_tpu.ops.conv_im2col as ci
    monkeypatch.setattr(ci, "resolve_use_fused_conv",
                        lambda use, h, w, ci_, co, dt: True)
    monkeypatch.setattr(
        ci, "conv3x3_fused",
        lambda x_, a_, b_, w_, bias_, r_: ci._conv3x3_fused_impl(
            x_, a_, b_, w_, bias_, r_, interpret=True))
    got = blk.apply(params, x, emb)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
    # keep-masked path: residual fusion must not change keep semantics
    keep = jnp.asarray([1.0, 0.0])
    want_k = None
    monkeypatch.setattr(ci, "resolve_use_fused_conv",
                        lambda *a_, **k: False)
    want_k = blk.apply(params, x, emb, keep=keep)
    monkeypatch.setattr(ci, "resolve_use_fused_conv",
                        lambda *a_, **k: True)
    got_k = blk.apply(params, x, emb, keep=keep)
    np.testing.assert_allclose(np.asarray(got_k), np.asarray(want_k),
                               rtol=2e-4, atol=2e-4)


def test_vae_resblock_fused_path_matches_default(monkeypatch):
    import autodiffusion_tpu.ops.conv_im2col as ci
    from autodiffusion_tpu.models.vae import VAEResnetBlock

    x = jax.random.normal(jax.random.PRNGKey(30), (1, 8, 8, 32),
                          jnp.float32)
    blk = VAEResnetBlock(out_channels=64)
    params = blk.init(jax.random.PRNGKey(31), x)
    want = blk.apply(params, x)
    monkeypatch.setattr(ci, "resolve_use_fused_conv",
                        lambda *a_, **k: True)
    monkeypatch.setattr(
        ci, "conv3x3_fused",
        lambda x_, a_, b_, w_, bias_, r_: ci._conv3x3_fused_impl(
            x_, a_, b_, w_, bias_, r_, interpret=True))
    got = blk.apply(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_fused_gate_bounds(monkeypatch):
    import autodiffusion_tpu.ops.conv_im2col as ci

    monkeypatch.setattr(ci.jax, "default_backend", lambda: "tpu")
    monkeypatch.delenv("ADT_FUSED_CONV", raising=False)
    # default = measured winners only (BENCH_NOTES "Round-5 fused-conv
    # verdict"): ADM res64 measured 0.28x, every 512px-VAE level won
    assert ci.resolve_use_fused_conv("auto", 64, 64, 192, 192) is False
    assert ci.resolve_use_fused_conv("auto", 512, 512, 128, 128) is True
    assert ci.resolve_use_fused_conv("auto", 256, 256, 512, 256) is True
    assert ci.resolve_use_fused_conv("auto", 64, 64, 320, 320) is True
    # "1" is the same whitelist; "0" forces off; "all" is the probe mode
    monkeypatch.setenv("ADT_FUSED_CONV", "1")
    assert ci.resolve_use_fused_conv("auto", 64, 64, 192, 192) is False
    assert ci.resolve_use_fused_conv("auto", 512, 512, 128, 128) is True
    monkeypatch.setenv("ADT_FUSED_CONV", "0")
    assert ci.resolve_use_fused_conv("auto", 512, 512, 128, 128) is False
    monkeypatch.setenv("ADT_FUSED_CONV", "all")
    assert ci.resolve_use_fused_conv("auto", 64, 64, 192, 192) is True
    # same Mosaic legality bounds as the plain im2col gate, in every mode
    assert ci.resolve_use_fused_conv("auto", 64, 64, 3, 192) is False
    assert ci.resolve_use_fused_conv("auto", 16, 16, 576, 576) is False
