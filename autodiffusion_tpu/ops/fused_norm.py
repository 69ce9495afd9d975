"""Fused GroupNorm(+FiLM)+SiLU (Pallas, TPU) with a fused backward.

This is SURVEY §7's "fused GroupNorm+SiLU(+epilogue)" kernel. The reference
runs GroupNorm in float32 around every conv (guided_diffusion/nn.py:17-19)
and applies the FiLM scale-shift + SiLU as separate elementwise ops
(unet.py:216-252); under XLA that costs at least two reads and one write of
the activation per normalization (stats pass + normalize pass), and the
classifier-guidance VJP pays it again on the way back. Here one kernel keeps
a whole sample's [N, C] activation slab resident in VMEM and does

    y = act( GN(x) * (1 + scale) + shift ),   GN in f32, per-(sample, group)

in a single read + single write of HBM. The backward kernel re-derives the
normalized activations from the saved per-group (mu, rstd) — two scalars per
group — so the residual traffic is x itself plus O(B*G) bytes, and emits
dgamma/dbeta (accumulated across the sequential batch grid in the resident
output block), dscale/dshift (per sample), and dx, again in one pass.

Group statistics use the matmul trick: per-channel sums [1, C] are reduced
to per-group sums with a one-hot [C, G] matrix on the MXU (and broadcast
back with its transpose), because reshaping the 128-wide lane dimension into
(groups, C//G) is a relayout Mosaic handles poorly for C % 128 != 0 (the ADM
192/384/576-channel cases).

Numerics match flax GroupNorm's fast-variance path: mean and mean-of-squares
in f32, var = max(0, E[x^2] - E[x]^2). FiLM and SiLU run in f32 (the unfused
path applies them in the compute dtype after the norm's f32->bf16 cast; the
difference is one bf16 rounding, covered by tests/test_fused_norm.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_group_norm", "fused_norm_available", "group_norm_reference"]

# Per-sample [N, C] element cap for the single-slab kernel. The backward's
# f32 dataflow peaks at ~33 bytes/element of scoped VMEM (measured: 26.2 MB
# at the 0.79M-element ADM level-0 slab), so 1.5M elements (covers the SD
# 512px latent level, 4096 x 320) stays within the raised 100 MB scoped
# limit with room for the pipeline's double-buffered DMAs. Larger slabs
# (VAE decoder at 512px, LSUN 256px level-0) fall back to the XLA path.
_MAX_SAMPLE_ELEMS = 3 << 19
_VMEM_LIMIT = 100 * (1 << 20)


def _group_onehot(c: int, groups: int):
    """[C, G] one-hot group-membership matrix (f32), built from iota."""
    ch = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 0)
    gr = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 1)
    return (ch // (c // groups) == gr).astype(jnp.float32)


def _to_group(v, m):
    """[1, C] @ [C, G] -> [1, G]."""
    return jax.lax.dot_general(v, m, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _to_chan(v, m):
    """[1, G] @ [C, G]^T -> [1, C]."""
    return jax.lax.dot_general(v, m, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _silu_and_grad(u):
    sig = jax.nn.sigmoid(u)
    return u * sig, sig * (1.0 + u * (1.0 - sig))


def _fwd_kernel(x_ref, gamma_ref, beta_ref, scale_ref, shift_ref,
                o_ref, mu_ref, rstd_ref, *, groups: int, eps: float,
                act: str):
    x = x_ref[0].astype(jnp.float32)                       # [N, C]
    n, c = x.shape
    m = _group_onehot(c, groups)
    cnt = float(n * (c // groups))

    s1 = jnp.sum(x, axis=0, keepdims=True)                 # [1, C]
    s2 = jnp.sum(x * x, axis=0, keepdims=True)
    mu_g = _to_group(s1, m) / cnt                          # [1, G]
    var_g = jnp.maximum(_to_group(s2, m) / cnt - mu_g * mu_g, 0.0)
    rstd_g = jax.lax.rsqrt(var_g + eps)

    mu = _to_chan(mu_g, m)                                 # [1, C]
    rstd = _to_chan(rstd_g, m)
    gamma = gamma_ref[...].astype(jnp.float32)             # [1, C]
    beta = beta_ref[...].astype(jnp.float32)
    scale = scale_ref[0].astype(jnp.float32)               # [1, C]
    shift = shift_ref[0].astype(jnp.float32)

    z = (x - mu) * (rstd * gamma) + beta
    u = z * (1.0 + scale) + shift
    if act == "silu":
        u, _ = _silu_and_grad(u)
    o_ref[0] = u.astype(o_ref.dtype)
    mu_ref[0] = mu_g
    rstd_ref[0] = rstd_g


def _bwd_kernel(x_ref, g_ref, gamma_ref, beta_ref, scale_ref, shift_ref,
                mu_ref, rstd_ref,
                dx_ref, dscale_ref, dshift_ref, dgamma_ref, dbeta_ref,
                *, groups: int, eps: float, act: str):
    i = pl.program_id(0)
    nb = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        dgamma_ref[...] = jnp.zeros_like(dgamma_ref)
        dbeta_ref[...] = jnp.zeros_like(dbeta_ref)

    x = x_ref[0].astype(jnp.float32)                       # [N, C]
    g = g_ref[0].astype(jnp.float32)
    n, c = x.shape
    m = _group_onehot(c, groups)
    cnt = float(n * (c // groups))

    gamma = gamma_ref[...].astype(jnp.float32)             # [1, C]
    beta = beta_ref[...].astype(jnp.float32)
    scale = scale_ref[0].astype(jnp.float32)               # [1, C]
    shift = shift_ref[0].astype(jnp.float32)
    mu = _to_chan(mu_ref[0], m)                            # [1, C]
    rstd = _to_chan(rstd_ref[0], m)

    xhat = (x - mu) * rstd
    z = xhat * gamma + beta
    if act == "silu":
        u = z * (1.0 + scale) + shift
        _, dsilu = _silu_and_grad(u)
        du = g * dsilu
    else:
        du = g

    dshift_ref[0] = jnp.sum(du, axis=0, keepdims=True).astype(dshift_ref.dtype)
    dscale_ref[0] = jnp.sum(du * z, axis=0, keepdims=True).astype(dscale_ref.dtype)

    dz = du * (1.0 + scale)
    dgamma_ref[...] += jnp.sum(dz * xhat, axis=0, keepdims=True)
    dbeta_ref[...] += jnp.sum(dz, axis=0, keepdims=True)

    dxhat = dz * gamma
    m1 = _to_chan(_to_group(jnp.sum(dxhat, axis=0, keepdims=True), m) / cnt, m)
    m2 = _to_chan(_to_group(jnp.sum(dxhat * xhat, axis=0, keepdims=True), m) / cnt, m)
    dx_ref[0] = (rstd * (dxhat - m1 - xhat * m2)).astype(dx_ref.dtype)


def _fwd_impl(x, gamma, beta, scale, shift, groups, eps, act, interpret):
    b, n, c = x.shape
    return pl.pallas_call(
        functools.partial(_fwd_kernel, groups=groups, eps=eps, act=act),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, groups), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, groups), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, c), x.dtype),
            jax.ShapeDtypeStruct((b, 1, groups), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, groups), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(x, gamma, beta, scale[:, None, :], shift[:, None, :])


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _fgn(x, gamma, beta, scale, shift, groups, eps, act, interpret):
    return _fwd_impl(x, gamma, beta, scale, shift, groups, eps, act,
                     interpret)[0]


def _fgn_fwd(x, gamma, beta, scale, shift, groups, eps, act, interpret):
    y, mu, rstd = _fwd_impl(x, gamma, beta, scale, shift, groups, eps, act,
                            interpret)
    return y, (x, gamma, beta, scale, shift, mu, rstd)


def _fgn_bwd(groups, eps, act, interpret, res, g):
    x, gamma, beta, scale, shift, mu, rstd = res
    b, n, c = x.shape
    dx, dscale, dshift, dgamma, dbeta = pl.pallas_call(
        functools.partial(_bwd_kernel, groups=groups, eps=eps, act=act),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, groups), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, groups), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            # dgamma/dbeta accumulate across the sequential batch grid in a
            # resident output block (constant index map)
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, c), x.dtype),
            jax.ShapeDtypeStruct((b, 1, c), scale.dtype),
            jax.ShapeDtypeStruct((b, 1, c), shift.dtype),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(x, g, gamma, beta, scale[:, None, :], shift[:, None, :], mu, rstd)
    return (dx, dgamma.astype(gamma.dtype), dbeta.astype(beta.dtype),
            dscale[:, 0], dshift[:, 0])


_fgn.defvjp(_fgn_fwd, _fgn_bwd)


def fused_norm_available(x_shape, num_groups: int = 32) -> bool:
    """True when the fused kernel applies: TPU backend, channels divisible
    into groups, and one sample's activation slab fits the VMEM budget.

    OFF by default (opt in with ADT_FUSED_NORM=1): measured end-to-end on
    v5e, the single-slab kernel LOSES to XLA's own GroupNorm fusion at the
    ADM-64 guided-sampling shapes (69.5 vs 88.0 imgs/s headline) — the
    grid-(B,) slab layout pipelines HBM poorly and prevents XLA from fusing
    the norm with its neighbors. Kept (and parity-tested, incl. the fused
    backward) as the building block for shapes where XLA's pattern breaks
    down; see BENCH_NOTES.md "Fused GroupNorm kernel postmortem"."""
    import os
    if os.environ.get("ADT_FUSED_NORM", "0") != "1":
        return False
    c = x_shape[-1]
    n = 1
    for d in x_shape[1:-1]:
        n *= d
    return (jax.default_backend() == "tpu"
            and c % min(num_groups, c) == 0
            and n * c <= _MAX_SAMPLE_ELEMS
            and n >= 2)


def fused_group_norm(x: jnp.ndarray, gamma: jnp.ndarray, beta: jnp.ndarray,
                     *, scale: Optional[jnp.ndarray] = None,
                     shift: Optional[jnp.ndarray] = None,
                     num_groups: int = 32, eps: float = 1e-5,
                     act: str = "silu", interpret: bool = False) -> jnp.ndarray:
    """act(GN(x) * (1 + scale) + shift) in one fused pass.

    x: [B, ..., C] (any number of spatial/token dims); gamma/beta: [C];
    scale/shift: optional [B, C] FiLM conditioning; act: "silu" | "none".
    """
    shape = x.shape
    b, c = shape[0], shape[-1]
    groups = min(num_groups, c)
    assert c % groups == 0, (c, groups)
    xr = x.reshape(b, -1, c)
    if scale is None:
        scale = jnp.zeros((b, c), x.dtype)
    else:
        scale = scale.reshape(b, c)
    if shift is None:
        shift = jnp.zeros((b, c), x.dtype)
    else:
        shift = shift.reshape(b, c)
    y = _fgn(xr, gamma.reshape(1, c), beta.reshape(1, c), scale, shift,
             groups, float(eps), act, interpret)
    return y.reshape(shape)


def group_norm_reference(x, gamma, beta, *, scale=None, shift=None,
                         num_groups: int = 32, eps: float = 1e-5,
                         act: str = "silu"):
    """Pure-jnp f32 mirror of the kernel's math (for tests and fallback)."""
    shape = x.shape
    b, c = shape[0], shape[-1]
    groups = min(num_groups, c)
    xf = x.astype(jnp.float32).reshape(b, -1, groups, c // groups)
    mu = xf.mean(axis=(1, 3), keepdims=True)
    var = jnp.maximum((xf * xf).mean(axis=(1, 3), keepdims=True) - mu * mu, 0.0)
    xhat = ((xf - mu) * jax.lax.rsqrt(var + eps)).reshape(b, -1, c)
    z = xhat * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    if scale is not None:
        z = z * (1.0 + scale.reshape(b, 1, c).astype(jnp.float32))
    if shift is not None:
        z = z + shift.reshape(b, 1, c).astype(jnp.float32)
    if act == "silu":
        z = z * jax.nn.sigmoid(z)
    return z.reshape(shape).astype(x.dtype)
