"""Implicit-im2col 3x3 convolution (Pallas, TPU) for the UNet's hot convs.

Motivation (BENCH_NOTES.md "Round-3 conv roofline"): XLA's conv emitter
achieves only ~60% of MXU peak on the ADM-64 res64 shape (64x64, 192->192)
and the SD latent res64 shape (320 channels), because the 192/320-lane
channel dims pad to 256/384 on BOTH sides of the contraction. The *same
contraction* expressed as one im2col'd dot ([B*H*W, 9*C_in] x
[9*C_in, C_out]) pays the lane padding only once (K = 9*C_in is nearly
tile-aligned) and measured 90% of peak — but materializing the patches
operand in HBM costs more bandwidth than it saves. This kernel builds the
patch matrix **in VMEM, one row-tile at a time**, so the big-K dot runs at
its measured-efficient shape while HBM sees only the original input (plus
two extra halo rows per tile) and the output.

Mosaic legality (learned the hard way — the first version of this kernel
passed interpret-mode tests but failed to compile on the real TPU):
`tpu.memref_slice` (manual `ref.at[...]` DMAs from HBM) requires every
sliced trailing dim to be (8,128)-tile-aligned *against the padded
buffer*; a 192-channel NHWC tensor is stored 256-padded, so even a
full-channel manual slice is rejected ("Slice shape along dimension 3
must be aligned to tiling (128), but is 192"). Pipelined BlockSpecs do
not have that restriction when a block covers the full logical dim, so
the halo is delivered by passing the input THREE times with different
index maps instead of by manual DMA:

    grid (B, H/tile_h, C_out/co_block); per row tile (co == 0):
      main  block [1, tile_h, W, C]  rows [ti*th, ti*th+th)
      above block [1, 1, W, C]       row  ti*th - 1   (clamped; zeroed at ti=0)
      below block [1, 1, W, C]       row  ti*th + th  (clamped; zeroed at last)
      patch build: 9 shifted VMEM copies -> patches[tile_h, W, 9*C_in]
    every (co) step: one MXU dot [tile_h*W, 9*C_in] x [9*C_in, co] -> f32

Pallas pipelining double-buffers the blocks, so the next tile's rows
stream in while this tile builds + dots (the old manual-DMA design needed
an explicit prefetch variant for that). Block shapes obey Mosaic tiling:
W and C are full dims, 9*C_in is the full weight dim, tile_h*W is a
multiple of 8 at every gated shape, and co_block is 128-aligned or the
full C_out (enforced by _pick_co_block).

The Pallas kernel is forward-only; `conv3x3` carries a custom_vjp whose
backward delegates to the XLA conv's own VJP. That backward IS a hot path
when the gate is on: classifier guidance jax.grad's through the classifier's
ResBlock convs every sampling step (guidance.py), so the enabled
configuration runs Pallas forwards + XLA conv-transpose backwards — bench.py
times exactly that composition (the guided step includes the classifier
fwd+VJP).

Semantics match flax nn.Conv(features, (3,3), padding=1) exactly: NHWC x
HWIO, stride 1, SAME padding (guided_diffusion/unet.py:216-252 ResBlock
convs are the dominant consumers). MEASURED OUTCOME (BENCH_NOTES.md
"Round-3 follow-up"): wins the isolated conv microbench only at
64x64x320->320 (+5-8%), and even there loses end to end because XLA
cannot fuse the adjacent elementwise ops into a custom call — the gate
stays default-off; ADT_IM2COL_CONV=1 + the whitelist remain as the probe
harness (ledger discipline: do not enable net-negative kernels).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["conv3x3", "conv3x3_im2col", "conv3x3_fused",
           "resolve_use_im2col", "resolve_use_fused_conv"]

# Shapes (H, W, C_in, C_out) where the kernel measured FASTER than XLA's
# conv on the ISOLATED conv microbench (BENCH_NOTES.md "Round-3
# follow-up", 3 repeats): the SD latent res64 level (320 ch: XLA pads
# 320->384 on both contraction sides, the im2col dot only on N; +5-8%
# wall). Everywhere else XLA won (res64 192ch: the misaligned-lane patch
# writes cost more than the K-padding saves; 640/1280 ch deep levels:
# weight-block streaming; 384/576/768: XLA already at 80-99% of the
# roofline). The END-TO-END A/B at the only winning shape measured NET
# NEGATIVE (SD CFG step 111.8 -> 113.3 ms: XLA fuses the surrounding
# GroupNorm-scale/SiLU/residual elementwise ops into its conv but cannot
# fuse into a Pallas custom call, and that fusion loss exceeds the
# isolated win) — so even with ADT_IM2COL_CONV=1 this whitelist buys
# nothing in the product today; the gate + whitelist stay as the probe
# harness for future shapes. Explicit use=True bypasses the whitelist
# for probes and tests.
_MEASURED_WINNERS = frozenset({(64, 64, 320, 320)})

# Patch-matrix VMEM budget per grid step (bytes). The patch scratch is
# single-buffered; main/above/below/wmat/out blocks are double-buffered by
# the pipeline, so the conservative split below keeps the worst gated shape
# (sd32: 2*1.5 MB wmat + 3 MB patches + tiles) well under the ~16 MB/core
# ceiling.
_PATCH_BYTES_BUDGET = 3 * 1024 * 1024
# Weight-block [9*C_in, co_block] VMEM budget (double-buffered across the
# C_out grid dim -> worst case 2x this resident).
_WMAT_BYTES_BUDGET = 4 * 1024 * 1024


def resolve_use_im2col(use: object, h: int, w: int, c_in: int,
                       c_out: int, dtype=jnp.bfloat16) -> bool:
    """Resolve "auto" | True | False for one conv site.

    Requires a real TPU backend (Mosaic lowering) and a shape the kernel
    handles with Mosaic-legal blocks (see module docstring). "auto" is
    additionally gated on ADT_IM2COL_CONV=1 — default OFF until the on-chip
    measurement lands (BENCH_NOTES.md ledger discipline).
    """
    if jax.default_backend() != "tpu":
        return False
    if c_in < 64 or c_out < 64:
        # tiny contraction dims (the RGB stem conv, K = 9*3) or tiny output
        # dims (the final to-eps projection, N = 6) leave the MXU idle;
        # XLA's direct conv is the right tool there
        return False
    itemsize = jnp.dtype(dtype).itemsize
    if _pick_co_block(c_out, c_in, itemsize) is None:
        # no 128-aligned (or full) C_out block fits the VMEM weight budget
        return False
    th = _pick_tile_h(h, w, c_in, itemsize)
    if th is None:
        return False
    if (th * w) % 8 != 0 and th != h:
        # output block [tile_h*W, co] must be sublane-aligned unless it
        # covers the whole image
        return False
    if use == "auto":
        return (os.environ.get("ADT_IM2COL_CONV", "0") == "1"
                and (h, w, c_in, c_out) in _MEASURED_WINNERS)
    return bool(use)


def _pick_co_block(c_out: int, c_in: int,
                   itemsize: int = 2) -> "Optional[int]":
    """Largest Mosaic-legal divisor of C_out whose [9*C_in, co] weight
    block fits the VMEM budget. Legal = 128-lane-aligned, or the full
    C_out (a block equal to the array dim is exempt from alignment). SD's
    deep levels (640/1280 channels, bf16) split to co=128; ADM's 192/384
    keep one block; ADM's 576 has no legal split (5.97 MB full block
    exceeds the budget, and 576 has no 128-multiple divisor) -> None, and
    the gate falls back to XLA conv there (measured 95% of peak already).
    """
    best = None
    for co in range(1, c_out + 1):
        if c_out % co or (co % 128 and co != c_out):
            continue
        if 9 * c_in * co * itemsize > _WMAT_BYTES_BUDGET:
            break
        best = co
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


def _im2col_dot(wmat_ref, bias_ref, out_ref, patches, *,
                tile_h: int, wdim: int, c_in: int, has_bias: bool,
                split_k: bool = False):
    m = tile_h * wdim
    if split_k:
        # one K=3*C_in dot per kernel row, accumulated in f32: dot(dh)
        # depends only on that dh's patch columns, so Mosaic may overlap
        # patch-build VPU work with the MXU dots (the fused all-K dot
        # below serializes build -> dot). Probe decides.
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


def _build_patches(patches, main_ref, above_ref, below_ref, ti, n_t, *,
                   tile_h: int, wdim: int, c_in: int, transform=None):
    """Assemble the [tile_h, W, 9*C_in] patch matrix for one row tile.
    Runs under pl.when(co == 0) in the callers; the TPU grid is sequential
    so the scratch persists across the C_out blocks. ``transform``, if
    given, maps each delivered [R, W, C] input block (main + halo rows)
    before it enters the patch matrix — the fused-conv prologue.
    ti/n_t (the row-tile program id/count) are passed in because
    pl.program_id may not be called inside a pl.when body (the callers
    wrap this function in one)."""
    th = tile_h

    def put(dh, rows, src):
        # Write src [R, W, C] as the three dw-shifted column blocks of
        # patch rows `rows` for kernel row dh. Column block dh*3+dw must
        # match the HWIO weight reshape (rows (dh*3+dw)*C_in + ci); the
        # W-edge columns of the dw != 1 shifts are the SAME-pad zeros.
        zcol = jnp.zeros((src.shape[0], c_in), src.dtype)
        for dw in range(3):
            lo = (dh * 3 + dw) * c_in
            if dw == 0:
                patches[rows, 0, lo:lo + c_in] = zcol
                if wdim > 1:
                    patches[rows, 1:, lo:lo + c_in] = src[:, :wdim - 1]
            elif dw == 1:
                patches[rows, :, lo:lo + c_in] = src
            else:
                if wdim > 1:
                    patches[rows, :wdim - 1, lo:lo + c_in] = src[:, 1:]
                patches[rows, wdim - 1, lo:lo + c_in] = zcol

    main = main_ref[0]  # [tile_h, W, C]
    if transform is not None:
        main = transform(main)
    # interior rows: kernel row dh reads input row r + dh - 1
    put(1, slice(0, th), main)
    if th > 1:
        put(0, slice(1, th), main[:th - 1])
        put(2, slice(0, th - 1), main[1:])
    # halo rows: the tile above/below, or the SAME-pad zero row at the
    # image edges (above/below blocks are index-clamped there and
    # must be ignored)
    zrow = jnp.zeros((1, wdim, c_in), main.dtype)

    @pl.when(ti == 0)
    def _():
        put(0, slice(0, 1), zrow)

    @pl.when(ti > 0)
    def _():
        src = above_ref[0]
        put(0, slice(0, 1), src if transform is None else transform(src))

    @pl.when(ti == n_t - 1)
    def _():
        put(2, slice(th - 1, th), zrow)

    @pl.when(ti < n_t - 1)
    def _():
        src = below_ref[0]
        put(2, slice(th - 1, th), src if transform is None else transform(src))


def _conv_kernel(main_ref, above_ref, below_ref, wmat_ref, bias_ref,
                 out_ref, patches, *, tile_h: int, wdim: int, c_in: int,
                 has_bias: bool, split_k: bool = False):
    """Grid (B, H/tile_h, C_out/co_block), C_out innermost: the patch
    build runs once per row tile (co == 0) and the patch matrix persists
    in scratch across the C_out blocks (the TPU grid is sequential)."""
    ti = pl.program_id(1)
    n_t = pl.num_programs(1)

    @pl.when(pl.program_id(2) == 0)
    def _():
        _build_patches(patches, main_ref, above_ref, below_ref, ti, n_t,
                       tile_h=tile_h, wdim=wdim, c_in=c_in)

    _im2col_dot(wmat_ref, bias_ref, out_ref, patches,
                tile_h=tile_h, wdim=wdim, c_in=c_in, has_bias=has_bias,
                split_k=split_k)


def _fused_conv_kernel(main_ref, above_ref, below_ref, a_ref, b_ref,
                       wmat_ref, bias_ref, *rest, tile_h: int, wdim: int,
                       c_in: int, has_bias: bool, has_res: bool):
    """conv3x3 with the ResBlock's surrounding elementwise ops INGESTED
    (VERDICT r3 #2): input blocks are mapped through
    ``silu(x * a + b)`` in f32 (a/b fold GroupNorm mean/rstd/gamma/beta
    and the FiLM scale/shift into one per-(batch, channel) affine) before
    patch assembly, and the output tile takes an optional residual add.
    This is what the round-3 postmortems proved a bare Pallas conv is
    missing: XLA fuses norm-scale/SiLU/residual into ITS conv but nothing
    fuses into a custom call, so the custom call pays HBM round trips the
    XLA conv never does (BENCH_NOTES "Round-3 follow-up"). Here the fused
    epilogue rides the same VMEM pass as the patch build."""
    if has_res:
        res_ref, out_ref, patches = rest
    else:
        out_ref, patches = rest
        res_ref = None

    a = a_ref[0, 0].astype(jnp.float32)     # [C_in], broadcasts over rows
    b = b_ref[0, 0].astype(jnp.float32)

    def transform(src):
        xf = src.astype(jnp.float32) * a[None] + b[None]
        return (xf * jax.nn.sigmoid(xf)).astype(src.dtype)

    ti = pl.program_id(1)
    n_t = pl.num_programs(1)

    @pl.when(pl.program_id(2) == 0)
    def _():
        _build_patches(patches, main_ref, above_ref, below_ref, ti, n_t,
                       tile_h=tile_h, wdim=wdim, c_in=c_in,
                       transform=transform)

    m = tile_h * wdim
    p = patches[...].reshape(m, 9 * c_in)
    acc = jnp.dot(p, wmat_ref[...], preferred_element_type=jnp.float32)
    if has_bias:
        acc = acc + bias_ref[...].astype(jnp.float32)
    if res_ref is not None:
        acc = acc + res_ref[0].astype(jnp.float32)
    out_ref[0] = acc.astype(out_ref.dtype)


def conv3x3_im2col(x: jnp.ndarray, w: jnp.ndarray,
                   bias: Optional[jnp.ndarray] = None, *,
                   tile_h: Optional[int] = None,
                   co_block: Optional[int] = None,
                   split_k: bool = False,
                   interpret: bool = False) -> jnp.ndarray:
    """3x3 stride-1 SAME conv, NHWC x HWIO -> NHWC (forward only).

    x: [B, H, W, C_in]; w: [3, 3, C_in, C_out]; bias: [C_out] or None.
    co_block: C_out is split over the innermost grid dim in blocks of this
    size (default: largest Mosaic-legal divisor within the VMEM weight
    budget); the patch matrix is built once per row tile and reused across
    blocks. Explicit co_block/tile_h skip the legality gate (useful under
    interpret=True); on a real TPU they must keep blocks tile-aligned.
    """
    b, h, wdim, c_in = x.shape
    kh, kw, wc_in, c_out = w.shape
    if (kh, kw) != (3, 3) or wc_in != c_in:
        raise ValueError(f"conv3x3_im2col needs [3,3,{c_in},*] weights, "
                         f"got {w.shape}")
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

    kernel = functools.partial(_conv_kernel, tile_h=th, wdim=wdim,
                               c_in=c_in, has_bias=has_bias,
                               split_k=split_k)
    grid = (b, h // th, c_out // co)
    flat = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            # three views of x deliver the row tile + 1-row halos; the
            # clamped halo indices are unused at the image edges (the
            # kernel writes the zero pad row instead). Pallas skips the
            # re-fetch across co steps (block indices are ci-invariant).
            pl.BlockSpec((1, th, wdim, c_in),
                         lambda bi, ti, ci: (bi, ti, 0, 0)),
            pl.BlockSpec((1, 1, wdim, c_in),
                         lambda bi, ti, ci: (bi, jnp.maximum(ti * th - 1, 0),
                                             0, 0)),
            pl.BlockSpec((1, 1, wdim, c_in),
                         lambda bi, ti, ci: (bi, jnp.minimum(ti * th + th,
                                                             h - 1), 0, 0)),
            pl.BlockSpec((9 * c_in, co), lambda bi, ti, ci: (0, ci)),
            pl.BlockSpec((1, co), lambda bi, ti, ci: (0, ci)),
        ],
        out_specs=pl.BlockSpec((1, th * wdim, co),
                               lambda bi, ti, ci: (bi, ti, ci)),
        out_shape=jax.ShapeDtypeStruct((b, h * wdim, c_out), x.dtype),
        scratch_shapes=[pltpu.VMEM((th, wdim, 9 * c_in), x.dtype)],
        interpret=interpret,
    )(x, x, x, wmat, bias2d)
    return flat.reshape(b, h, wdim, c_out)


def _conv3x3_fused_impl(x, a, b, w, bias, residual, *,
                        tile_h=None, co_block=None, interpret=False):
    """Pallas dispatch for the fused norm-act-conv(-residual). See
    _fused_conv_kernel. x [B,H,W,C_in]; a/b [B,C_in] f32; residual
    [B,H,W,C_out] or None."""
    bsz, h, wdim, c_in = x.shape
    kh, kw, wc_in, c_out = w.shape
    if (kh, kw) != (3, 3) or wc_in != c_in:
        raise ValueError(f"conv3x3_fused needs [3,3,{c_in},*] weights, "
                         f"got {w.shape}")
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
    has_res = residual is not None

    kernel = functools.partial(_fused_conv_kernel, tile_h=th, wdim=wdim,
                               c_in=c_in, has_bias=has_bias, has_res=has_res)
    grid = (bsz, h // th, c_out // co)
    in_specs = [
        pl.BlockSpec((1, th, wdim, c_in),
                     lambda bi, ti, ci: (bi, ti, 0, 0)),
        pl.BlockSpec((1, 1, wdim, c_in),
                     lambda bi, ti, ci: (bi, jnp.maximum(ti * th - 1, 0),
                                         0, 0)),
        pl.BlockSpec((1, 1, wdim, c_in),
                     lambda bi, ti, ci: (bi, jnp.minimum(ti * th + th,
                                                         h - 1), 0, 0)),
        # [B, 1, C_in]: Mosaic's last-two-dims rule needs (1, c_in) to
        # EQUAL the trailing array dims — a flat [B, C_in] with block
        # (1, c_in) is illegal for B not divisible by 8 (found on real
        # Mosaic, round 5; interpret mode accepted it)
        pl.BlockSpec((1, 1, c_in), lambda bi, ti, ci: (bi, 0, 0)),
        pl.BlockSpec((1, 1, c_in), lambda bi, ti, ci: (bi, 0, 0)),
        pl.BlockSpec((9 * c_in, co), lambda bi, ti, ci: (0, ci)),
        pl.BlockSpec((1, co), lambda bi, ti, ci: (0, ci)),
    ]
    args = [x, x, x,
            a.astype(jnp.float32).reshape(bsz, 1, c_in),
            b.astype(jnp.float32).reshape(bsz, 1, c_in),
            wmat, bias2d]
    if has_res:
        in_specs.append(pl.BlockSpec((1, th * wdim, co),
                                     lambda bi, ti, ci: (bi, ti, ci)))
        args.append(residual.reshape(bsz, h * wdim, c_out))
    flat = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, th * wdim, co),
                               lambda bi, ti, ci: (bi, ti, ci)),
        out_shape=jax.ShapeDtypeStruct((bsz, h * wdim, c_out), x.dtype),
        scratch_shapes=[pltpu.VMEM((th, wdim, 9 * c_in), x.dtype)],
        interpret=interpret,
    )(*args)
    return flat.reshape(bsz, h, wdim, c_out)


def _xla_fused_ref(x, a, b, w, bias, residual):
    """The exact math conv3x3_fused implements, in XLA ops: the parity
    oracle, the non-TPU fallback, and the custom_vjp backward. NB the
    affine+SiLU runs in f32 and is cast to the conv dtype — the same
    contract as the kernel (GroupNorm32's default path instead applies
    FiLM/SiLU after the bf16 cast; the fused fold is one bf16 rounding
    step MORE precise, see norm_act_conv3x3)."""
    xf = (x.astype(jnp.float32) * a[:, None, None, :]
          + b[:, None, None, :])
    xt = (xf * jax.nn.sigmoid(xf)).astype(x.dtype)
    out = _xla_conv3x3(xt, w, bias)
    if residual is not None:
        out = out + residual
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def conv3x3_fused(x, a, b, w, bias, residual=None, tile_h=None,
                  interpret=False):
    """silu(x*a + b) -> 3x3 SAME conv -> (+ bias) (+ residual), one Pallas
    pass (VERDICT r3 #2: the epilogue-ingesting conv). The backward
    delegates to the XLA expression's own VJP — exact for the fused math;
    it IS a hot path when the gate routes the guidance classifier's
    ResBlocks here (jax.grad inside the sampling scan)."""
    return _conv3x3_fused_impl(x, a, b, w, bias, residual, tile_h=tile_h,
                               interpret=interpret)


def _conv3x3_fused_fwd(x, a, b, w, bias, residual, tile_h, interpret):
    return (conv3x3_fused(x, a, b, w, bias, residual, tile_h, interpret),
            (x, a, b, w, bias, residual))


def _conv3x3_fused_bwd(tile_h, interpret, res, g):
    x, a, b, w, bias, residual = res
    diff = [x, a, b, w] + ([bias] if bias is not None else []) \
        + ([residual] if residual is not None else [])

    def f(*args):
        xs = list(args)
        x_, a_, b_, w_ = xs[:4]
        rest = xs[4:]
        bias_ = rest.pop(0) if bias is not None else None
        res_ = rest.pop(0) if residual is not None else None
        return _xla_fused_ref(x_, a_, b_, w_, bias_, res_)

    _, vjp = jax.vjp(f, *diff)
    grads = list(vjp(g))
    dx, da, db, dw = grads[:4]
    rest = grads[4:]
    dbias = rest.pop(0) if bias is not None else None
    dres = rest.pop(0) if residual is not None else None
    return dx, da, db, dw, dbias, dres


conv3x3_fused.defvjp(_conv3x3_fused_fwd, _conv3x3_fused_bwd)


# (H, W, C_in, C_out) sites where the FUSED norm-act-conv-residual kernel
# measured faster on chip BOTH in the isolated chain probe
# (probe_fused_conv.py — both sides run the complete GN-stats + normalize
# + SiLU + conv + residual composition, so the XLA side already enjoys its
# elementwise fusions) AND in the end-to-end program that owns the shape
# (BENCH_NOTES "Round-5 fused-conv verdict"). The winners are the 512px
# VAE decoder's large-spatial slabs (chain probe 1.05-1.26x; standalone
# 512px decode 288.8 -> 169.1 ms, 1.71x, MFU 0.273 -> 0.467). Excluded by
# measurement: every compute-bound shape (ADM 192/384ch 0.28-0.78x, SD
# 640/1280ch deep levels 0.56-0.75x, VAE 64px mid-block a 1.015x tie) and
# the SD latent res64 (64,64,320,320) — its chain probe won 1.18x but the
# end-to-end CFG denoise step measured 112.1 -> 112.3 ms (neutral at
# best: the round-3 in-context fusion-loss pattern). The SD FITNESS chunk
# additionally traces with the gate defaulted off (search/fitness.py
# _trace_with_fused_conv_defaulted_off): even the VAE winners lose inside
# that megaprogram (0.697 -> 0.773 s/candidate). Unmeasured shapes fall
# back to XLA: ledger discipline cuts both ways.
_FUSED_MEASURED_WINNERS = frozenset({
    (512, 512, 128, 128),   # VAE decoder level 3 (1.050x)
    (512, 512, 256, 128),   # VAE decoder 256->128 transition (1.205x)
    (256, 256, 256, 256),   # VAE decoder level 2 (1.192x)
    (256, 256, 512, 256),   # VAE decoder 512->256 transition (1.160x)
    (128, 128, 512, 512),   # VAE decoder level 1 (1.264x)
})


def resolve_use_fused_conv(use: object, h: int, w: int, c_in: int,
                           c_out: int, dtype=jnp.bfloat16) -> bool:
    """Gate for the fused norm-act-conv path. Same Mosaic legality as
    resolve_use_im2col. "auto" consults ADT_FUSED_CONV:
    unset or "1" -> the measured-winners whitelist (the default: every
    entry beat XLA's fused chain on chip, BENCH_NOTES "Round-5 fused-conv
    verdict"); "0" -> off everywhere (bench FLOP-counting twins, A/B
    baselines); "all" -> every Mosaic-legal shape (probe harness only)."""
    if jax.default_backend() != "tpu":
        return False
    if c_in < 64 or c_out < 64:
        return False
    itemsize = jnp.dtype(dtype).itemsize
    if _pick_co_block(c_out, c_in, itemsize) is None:
        return False
    th = _pick_tile_h(h, w, c_in, itemsize)
    if th is None:
        return False
    if (th * w) % 8 != 0 and th != h:
        return False
    if use == "auto":
        env = os.environ.get("ADT_FUSED_CONV", "1")
        if env == "0":
            return False
        if env == "all":
            return True
        return (h, w, c_in, c_out) in _FUSED_MEASURED_WINNERS
    return bool(use)


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
