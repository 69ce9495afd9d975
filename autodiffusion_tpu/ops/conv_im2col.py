"""Implicit-im2col 3x3 convolution (Pallas, TPU) for the UNet's hot convs.

Motivation (BENCH_NOTES.md "Round-3 conv roofline"): XLA's conv emitter
achieves only ~50% of MXU peak on the ADM-64 res64 shape (64x64, 192->192),
while the *same contraction* expressed as one im2col'd dot
([B*H*W, 9*C_in] x [9*C_in, C_out]) measures 90.4% peak — but materializing
the patches operand in HBM costs more bandwidth than it saves. This kernel
builds the patch matrix **in VMEM, one row-tile at a time**, so the big-K
dot runs at its measured-efficient shape while HBM sees only the original
input (plus a 1-pixel zero halo) and the output:

    grid (B, H/tile_h); per step:
      DMA x_pad[b, i*tile_h : i*tile_h + tile_h + 2]  (HBM -> VMEM, w/ halo)
      9 VMEM copies -> patches[tile_h, W, 9*C_in]      (the implicit im2col)
      one MXU dot  [tile_h*W, 9*C_in] x [9*C_in, C_out] -> f32
      (+ bias) -> out[b, i]

The Pallas kernel is forward-only; `conv3x3` carries a custom_vjp whose
backward delegates to the XLA conv's own VJP. That backward IS a hot path
when the gate is on: classifier guidance jax.grad's through the classifier's
ResBlock convs every sampling step (guidance.py), so the enabled
configuration runs Pallas forwards + XLA conv-transpose backwards — bench.py
times exactly that composition (the guided step includes the classifier
fwd+VJP).

Semantics match flax nn.Conv(features, (3,3), padding=1) exactly: NHWC x
HWIO, stride 1, SAME padding (guided_diffusion/unet.py:216-252 ResBlock
convs are the dominant consumers). Opt-in via ADT_IM2COL_CONV=1 pending an
on-chip measurement (the ledger's prior Mosaic kernels at neighboring
shapes measured net negative; estimated ceiling here is ~65-75% of peak on
res64, i.e. ~+5% headline MFU).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["conv3x3", "conv3x3_im2col", "resolve_use_im2col"]

# Patch-matrix VMEM budget per grid step (bf16 bytes). With double-buffered
# weights/out blocks and the halo tile this keeps total VMEM well under the
# ~16 MB/core ceiling.
_PATCH_BYTES_BUDGET = 4 * 1024 * 1024
# Weight-matrix [9*C_in, C_out] VMEM budget: it is resident for the whole
# pallas_call next to the patch tile (ADM's largest, 576->576, is 6.0 MB).
_WMAT_BYTES_BUDGET = 6 * 1024 * 1024 + 64 * 1024


def resolve_use_im2col(use: object, h: int, w: int, c_in: int,
                       c_out: int, dtype=jnp.bfloat16) -> bool:
    """Resolve "auto" | True | False for one conv site.

    Requires a real TPU backend (Mosaic lowering) and a shape the kernel
    handles (static H divisible by some tile, 3x3 stride-1 SAME). "auto" is
    additionally gated on ADT_IM2COL_CONV=1 — default OFF until the on-chip
    measurement lands (BENCH_NOTES.md ledger discipline: neighboring Mosaic
    kernels measured net negative; do not enable unmeasured kernels).
    """
    if jax.default_backend() != "tpu":
        return False
    if c_in < 64 or c_out < 64:
        # tiny contraction dims (the RGB stem conv, K = 9*3) or tiny output
        # dims (the final to-eps projection, N = 6) leave the MXU idle;
        # XLA's direct conv is the right tool there
        return False
    itemsize = jnp.dtype(dtype).itemsize
    if _pick_co_block(c_out, c_in, itemsize, min_block=64) is None:
        # no C_out split keeps a useful [9*C_in, co_block] weight block
        # within the VMEM budget (would need co_block < 64 lanes)
        return False
    if _pick_tile_h(h, w, c_in, itemsize) is None:
        return False
    if use == "auto":
        return os.environ.get("ADT_IM2COL_CONV", "0") == "1"
    return bool(use)


def _pick_co_block(c_out: int, c_in: int, itemsize: int = 2,
                   min_block: int = 1) -> "Optional[int]":
    """Largest divisor of C_out whose [9*C_in, co_block] weight block fits
    the VMEM budget (the block is double-buffered across the C_out grid
    dim, hence the headroom in _WMAT_BYTES_BUDGET). SD's deepest level
    (1280->1280 bf16) splits to co_block=256; ADM shapes keep one block.
    min_block is the gate's efficiency floor (128-lane MXU tiles); the
    kernel itself is correct for any divisor."""
    best = None
    for co in range(1, c_out + 1):
        if c_out % co:
            continue
        if 9 * c_in * co * itemsize > _WMAT_BYTES_BUDGET:
            break
        best = co
    if best is not None and best < min_block:
        return None
    return best


def _pick_tile_h(h: int, w: int, c_in: int,
                 itemsize: int = 2) -> Optional[int]:
    """Largest divisor of H whose patch matrix fits the VMEM budget,
    stopping once M = tile_h * W reaches 512 rows (MXU M streaming is
    saturated well before that; bigger tiles only cost VMEM)."""
    best = None
    for th in range(1, h + 1):
        if h % th:
            continue
        patch_bytes = th * w * 9 * c_in * itemsize
        if patch_bytes > _PATCH_BYTES_BUDGET:
            break
        best = th
        if th * w >= 512:  # diminishing returns past ~512 rows
            break
    if best is not None and best * w < 8:  # degenerate sublane dim
        return None
    return best


def _build_patches(xtile, patches, *, tile_h: int, wdim: int, c_in: int):
    # Implicit im2col: 9 shifted [tile_h, W, C] windows of the halo tile
    # laid side by side along the contraction dim. Column block dh*3+dw must
    # match the HWIO weight reshape (rows (dh*3+dw)*C_in + ci).
    for dh in range(3):
        for dw in range(3):
            j = dh * 3 + dw
            patches[:, :, j * c_in:(j + 1) * c_in] = (
                xtile[dh:dh + tile_h, dw:dw + wdim, :])


def _im2col_dot(wmat_ref, bias_ref, out_ref, patches, *,
                tile_h: int, wdim: int, c_in: int, has_bias: bool,
                split_k: bool = False):
    m = tile_h * wdim
    if split_k:
        # one K=3*C_in dot per kernel row, accumulated in f32: dot(dh)
        # depends only on that dh's patch columns, so Mosaic may overlap
        # the next row's VPU copies with the current MXU dot (the fused
        # all-K dot below serializes build -> dot). Probe decides.
        acc = jnp.zeros((m, out_ref.shape[-1]), jnp.float32)
        for dh in range(3):
            pk = patches[:, :, dh * 3 * c_in:(dh + 1) * 3 * c_in]
            acc = acc + jnp.dot(pk.reshape(m, 3 * c_in),
                                wmat_ref[dh * 3 * c_in:(dh + 1) * 3 * c_in],
                                preferred_element_type=jnp.float32)
    else:
        p = patches[...].reshape(m, 9 * c_in)
        acc = jnp.dot(p, wmat_ref[...], preferred_element_type=jnp.float32)
    if has_bias:
        acc = acc + bias_ref[...].astype(jnp.float32)
    out_ref[0] = acc.astype(out_ref.dtype)


def _conv_kernel(x_hbm, wmat_ref, bias_ref, out_ref, xtile, patches, sem, *,
                 tile_h: int, wdim: int, c_in: int, has_bias: bool,
                 split_k: bool = False):
    """pad="xla" variant: x_hbm is pre-padded [B, H+2, W+2, C].

    Grid is (B, H/tile_h, C_out/co_block), C_out innermost: the halo DMA
    and patch build run once per row tile (co == 0) and the patch matrix
    persists in scratch across the C_out blocks."""
    bi = pl.program_id(0)
    ti = pl.program_id(1)

    @pl.when(pl.program_id(2) == 0)
    def _():
        cp = pltpu.make_async_copy(
            x_hbm.at[bi, pl.ds(ti * tile_h, tile_h + 2)], xtile, sem)
        cp.start()
        cp.wait()
        _build_patches(xtile, patches, tile_h=tile_h, wdim=wdim, c_in=c_in)

    _im2col_dot(wmat_ref, bias_ref, out_ref, patches,
                tile_h=tile_h, wdim=wdim, c_in=c_in, has_bias=has_bias,
                split_k=split_k)


def _issue_halo(x_hbm, xt, sems_row, bi_, ti_, n_t, *, tile_h: int,
                wdim: int, c_in: int, zero_cols):
    """Zero-fill + start the halo DMAs for tile (bi_, ti_) into xtile view
    ``xt`` tracked by ``sems_row`` ([3] DMA semaphores: interior/top/
    bottom). The ONE definition of the in-kernel halo assembly, shared by
    the plain and prefetch padfree kernels.

    zero_cols: the W-halo columns are never DMA-targeted, so they persist
    across tiles — pass True only on a buffer's first use. Edge ROWS must
    be re-zeroed per edge tile (interior tiles DMA into the same rows)."""
    r0_ = ti_ * tile_h

    @pl.when(zero_cols)
    def _():
        xt[:, 0, :] = jnp.zeros((tile_h + 2, c_in), xt.dtype)
        xt[:, wdim + 1, :] = jnp.zeros((tile_h + 2, c_in), xt.dtype)

    pltpu.make_async_copy(
        x_hbm.at[bi_, pl.ds(r0_, tile_h)],
        xt.at[pl.ds(1, tile_h), pl.ds(1, wdim)], sems_row.at[0]).start()

    @pl.when(ti_ == 0)
    def _():
        xt[0, 1:wdim + 1, :] = jnp.zeros((wdim, c_in), xt.dtype)

    @pl.when(ti_ > 0)
    def _():
        pltpu.make_async_copy(
            x_hbm.at[bi_, r0_ - 1], xt.at[0, pl.ds(1, wdim)],
            sems_row.at[1]).start()

    @pl.when(ti_ == n_t - 1)
    def _():
        xt[tile_h + 1, 1:wdim + 1, :] = jnp.zeros((wdim, c_in), xt.dtype)

    @pl.when(ti_ < n_t - 1)
    def _():
        pltpu.make_async_copy(
            x_hbm.at[bi_, r0_ + tile_h],
            xt.at[tile_h + 1, pl.ds(1, wdim)], sems_row.at[2]).start()


def _wait_halo(x_hbm, xt, sems_row, bi_, ti_, n_t, *, tile_h: int,
               wdim: int):
    """Wait for _issue_halo's DMAs — the conditions mirror the issue side
    exactly (same ti_), so exactly the started copies are awaited."""
    r0_ = ti_ * tile_h
    pltpu.make_async_copy(
        x_hbm.at[bi_, pl.ds(r0_, tile_h)],
        xt.at[pl.ds(1, tile_h), pl.ds(1, wdim)], sems_row.at[0]).wait()

    @pl.when(ti_ > 0)
    def _():
        pltpu.make_async_copy(
            x_hbm.at[bi_, r0_ - 1], xt.at[0, pl.ds(1, wdim)],
            sems_row.at[1]).wait()

    @pl.when(ti_ < n_t - 1)
    def _():
        pltpu.make_async_copy(
            x_hbm.at[bi_, r0_ + tile_h],
            xt.at[tile_h + 1, pl.ds(1, wdim)], sems_row.at[2]).wait()


def _conv_kernel_padfree(x_hbm, wmat_ref, bias_ref, out_ref, xtile, patches,
                         sems, *, tile_h: int, wdim: int, c_in: int,
                         has_bias: bool, split_k: bool = False):
    """pad="kernel" variant: x_hbm is the UNPADDED [B, H, W, C] input; the
    1-pixel zero halo is assembled in VMEM (zeroed columns + conditional
    edge rows), so the input never takes the XLA pad's extra HBM round
    trip (~2x the input traffic at res64 — the pad output cannot fuse into
    a custom call)."""
    bi = pl.program_id(0)
    ti = pl.program_id(1)
    n_t = pl.num_programs(1)

    @pl.when(pl.program_id(2) == 0)
    def _():
        _issue_halo(x_hbm, xtile, sems, bi, ti, n_t, tile_h=tile_h,
                    wdim=wdim, c_in=c_in,
                    zero_cols=(bi * n_t + ti) == 0)
        _wait_halo(x_hbm, xtile, sems, bi, ti, n_t, tile_h=tile_h,
                   wdim=wdim)
        _build_patches(xtile, patches, tile_h=tile_h, wdim=wdim, c_in=c_in)

    _im2col_dot(wmat_ref, bias_ref, out_ref, patches,
                tile_h=tile_h, wdim=wdim, c_in=c_in, has_bias=has_bias,
                split_k=split_k)


def _conv_kernel_padfree_prefetch(x_hbm, wmat_ref, bias_ref, out_ref,
                                  xtile2, patches, sems2, *, tile_h: int,
                                  wdim: int, c_in: int, has_bias: bool,
                                  split_k: bool = False):
    """pad="kernel" + cross-tile prefetch: the NEXT row tile's halo DMA is
    started before this tile's patch build + dots, hiding the DMA latency
    the plain padfree kernel serializes. xtile2 is 2-slot ([2, th+2, W+2,
    C], slot = linear tile index % 2, correct across batch boundaries);
    sems2 is [2, 3]. patches needs one slot — tile t+1's build happens
    strictly after tile t's last C_out block (the TPU grid is
    sequential)."""
    bi = pl.program_id(0)
    ti = pl.program_id(1)
    n_t = pl.num_programs(1)
    n_tiles = pl.num_programs(0) * n_t
    tile_idx = bi * n_t + ti

    def issue(t):
        _issue_halo(x_hbm, xtile2.at[t % 2], sems2.at[t % 2],
                    t // n_t, t % n_t, n_t, tile_h=tile_h, wdim=wdim,
                    c_in=c_in, zero_cols=t < 2)

    @pl.when(pl.program_id(2) == 0)
    def _():
        slot = tile_idx % 2

        @pl.when(tile_idx == 0)
        def _():
            issue(0)  # warmup: no earlier step issued tile 0

        _wait_halo(x_hbm, xtile2.at[slot], sems2.at[slot], bi, ti, n_t,
                   tile_h=tile_h, wdim=wdim)

        # prefetch the next tile while this tile builds + dots
        @pl.when(tile_idx + 1 < n_tiles)
        def _():
            issue(tile_idx + 1)

        _build_patches(xtile2.at[slot], patches, tile_h=tile_h, wdim=wdim,
                       c_in=c_in)

    _im2col_dot(wmat_ref, bias_ref, out_ref, patches,
                tile_h=tile_h, wdim=wdim, c_in=c_in, has_bias=has_bias,
                split_k=split_k)


def conv3x3_im2col(x: jnp.ndarray, w: jnp.ndarray,
                   bias: Optional[jnp.ndarray] = None, *,
                   tile_h: Optional[int] = None,
                   co_block: Optional[int] = None,
                   pad: str = "kernel",
                   split_k: bool = False,
                   prefetch: bool = False,
                   interpret: bool = False) -> jnp.ndarray:
    """3x3 stride-1 SAME conv, NHWC x HWIO -> NHWC (forward only).

    x: [B, H, W, C_in]; w: [3, 3, C_in, C_out]; bias: [C_out] or None.
    pad: "kernel" assembles the zero halo in VMEM (no extra HBM pass);
    "xla" pre-pads with jnp.pad (kept for the A/B probe).
    co_block: C_out is split over the innermost grid dim in blocks of this
    size (default: largest divisor within the VMEM weight budget); the
    patch matrix is built once per row tile and reused across blocks.
    """
    b, h, wdim, c_in = x.shape
    kh, kw, wc_in, c_out = w.shape
    if (kh, kw) != (3, 3) or wc_in != c_in:
        raise ValueError(f"conv3x3_im2col needs [3,3,{c_in},*] weights, "
                         f"got {w.shape}")
    if pad not in ("kernel", "xla"):
        raise ValueError(f"pad must be 'kernel' or 'xla', got {pad!r}")
    itemsize = jnp.dtype(x.dtype).itemsize
    th = (tile_h if tile_h is not None
          else _pick_tile_h(h, wdim, c_in, itemsize))
    if th is None or h % th:
        raise ValueError(f"no valid row tile for H={h} (tile_h={tile_h})")
    co = (co_block if co_block is not None
          else _pick_co_block(c_out, c_in, itemsize))
    if co is None or c_out % co:
        raise ValueError(f"no valid C_out block for C_out={c_out} "
                         f"(co_block={co_block})")

    wmat = w.reshape(9 * c_in, c_out)
    has_bias = bias is not None
    bias2d = (bias.reshape(1, c_out) if has_bias
              else jnp.zeros((1, c_out), w.dtype))

    # one decision per branch: kernel fn + input + sems + halo-tile shape
    if pad == "xla":
        if prefetch:
            raise ValueError("prefetch applies only to pad='kernel' (the "
                             "xla-pad kernel has a single unconditioned "
                             "DMA); refusing to silently ignore it")
        x_in = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        kernel = functools.partial(_conv_kernel, tile_h=th, wdim=wdim,
                                   c_in=c_in, has_bias=has_bias,
                                   split_k=split_k)
        sems = pltpu.SemaphoreType.DMA(())
        xtile_shape = (th + 2, wdim + 2, c_in)
    elif prefetch:
        x_in = x
        kernel = functools.partial(_conv_kernel_padfree_prefetch, tile_h=th,
                                   wdim=wdim, c_in=c_in, has_bias=has_bias,
                                   split_k=split_k)
        sems = pltpu.SemaphoreType.DMA((2, 3))
        xtile_shape = (2, th + 2, wdim + 2, c_in)
    else:
        x_in = x
        kernel = functools.partial(_conv_kernel_padfree, tile_h=th,
                                   wdim=wdim, c_in=c_in, has_bias=has_bias,
                                   split_k=split_k)
        sems = pltpu.SemaphoreType.DMA((3,))
        xtile_shape = (th + 2, wdim + 2, c_in)

    grid = (b, h // th, c_out // co)
    flat = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),         # input stays in HBM
            pl.BlockSpec((9 * c_in, co), lambda bi, ti, ci: (0, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co), lambda bi, ti, ci: (0, ci),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th * wdim, co),
                               lambda bi, ti, ci: (bi, ti, ci),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h * wdim, c_out), x.dtype),
        scratch_shapes=[
            pltpu.VMEM(xtile_shape, x.dtype),
            pltpu.VMEM((th, wdim, 9 * c_in), x.dtype),
            sems,
        ],
        interpret=interpret,
    )(x_in, wmat, bias2d)
    return flat.reshape(b, h, wdim, c_out)


def _xla_conv3x3(x, w, bias):
    """The XLA reference the kernel must match: flax nn.Conv's exact
    lowering for a 3x3 stride-1 padding-1 NHWC conv. Also the Conv3x3
    module's fallback and the custom_vjp backward, so the three stay one
    definition."""
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if bias is not None:
        out = out + bias.reshape((1,) * (out.ndim - 1) + (-1,)).astype(out.dtype)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def conv3x3(x, w, bias, tile_h=None, interpret=False):
    """conv3x3_im2col with a correct (XLA-conv) backward.

    The product path never takes this VJP (sampling does not differentiate
    UNet convs); it exists so a stray jax.grad is exact instead of an error.
    """
    return conv3x3_im2col(x, w, bias, tile_h=tile_h, interpret=interpret)


def _conv3x3_fwd(x, w, bias, tile_h, interpret):
    return conv3x3(x, w, bias, tile_h, interpret), (x, w, bias)


def _conv3x3_bwd(tile_h, interpret, res, g):
    x, w, bias = res
    if bias is None:
        _, vjp = jax.vjp(lambda x_, w_: _xla_conv3x3(x_, w_, None), x, w)
        dx, dw = vjp(g)
        return dx, dw, None
    _, vjp = jax.vjp(_xla_conv3x3, x, w, bias)
    return vjp(g)


conv3x3.defvjp(_conv3x3_fwd, _conv3x3_bwd)
