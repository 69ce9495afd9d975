"""AutoencoderKL (the SD first-stage VAE) in flax NHWC.

Re-design of ldm/models/autoencoder.py:285-443 and
ldm/modules/diffusionmodules/model.py:368-570: Encoder -> diagonal Gaussian
moments, Decoder, with the CompVis quirks kept — GroupNorm eps 1e-6, swish
nonlinearity, asymmetric (0,1,0,1) padding on the stride-2 downsample conv,
single-head conv-projection attention blocks, quant/post_quant 1x1 convs,
and the 0.18215 latent scale factor applied by the caller
(v1-inference.yaml:17).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

SD_SCALE_FACTOR = 0.18215


class VAEGroupNorm(nn.Module):
    """CompVis Normalize (eps 1e-6), fused with SiLU on TPU when ``act`` is
    given (ops/fused_norm.py; the 512px decoder level-0 slab exceeds the
    kernel's VMEM cap and falls back automatically)."""

    @nn.compact
    def __call__(self, x, *, act=None, return_affine=False):
        from .nn import GroupNorm32
        return GroupNorm32(epsilon=1e-6, name="gn")(
            x, act=act, return_affine=return_affine)


class VAEResnetBlock(nn.Module):
    out_channels: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from ..ops.conv_im2col import resolve_use_fused_conv
        from .nn import Conv3x3

        c_out = self.out_channels or x.shape[-1]
        c_in = x.shape[-1]
        hh, ww = x.shape[1:3]
        # norm-act-conv(-residual) fusion (ADT_FUSED_CONV; see unet.py
        # ResBlock). The 512px decoder's 128-channel convs are the worst
        # measured conv shape in the repo (~42% useful MXU, BENCH_NOTES
        # "Round-3 conv roofline") — these are the fused kernel's target.
        cdtype = jnp.bfloat16 if self.dtype == jnp.bfloat16 else jnp.float32
        fuse1 = resolve_use_fused_conv("auto", hh, ww, c_in, c_out, cdtype)
        fuse2 = resolve_use_fused_conv("auto", hh, ww, c_out, c_out, cdtype)

        norm1 = VAEGroupNorm(name="norm1")
        conv1 = Conv3x3(c_out, dtype=self.dtype, name="conv1")
        if fuse1:
            h = conv1(x, affine=norm1(x, return_affine=True))
        else:
            h = conv1(norm1(x, act="silu"))
        if c_out != c_in:
            x = nn.Conv(c_out, (1, 1), dtype=self.dtype, name="nin_shortcut")(x)
        norm2 = VAEGroupNorm(name="norm2")
        conv2 = Conv3x3(c_out, dtype=self.dtype, name="conv2")
        if fuse2:
            return conv2(h, affine=norm2(h, return_affine=True), residual=x)
        return x + conv2(norm2(h, act="silu"))


class VAEAttnBlock(nn.Module):
    """Single-head spatial attention with 1x1-conv projections
    (model.py:141-184).

    On TPU with >=1024 tokens the Pallas flash kernel replaces the einsum:
    the 512px decode's mid-block attention is T=4096 single-head D=512 —
    the f32 [B,4096,4096] logits tensor (64 MB/image, written + read twice)
    is the decoder's dominant HBM traffic, and the online-softmax kernel
    never materializes it. The kernel also accumulates logits in f32 where
    the einsum path rounds them to bf16 first, so the flash path is both
    faster and slightly MORE faithful to the f32-softmax policy."""

    dtype: Dtype = jnp.float32
    use_flash: Any = "auto"

    @nn.compact
    def __call__(self, x):
        b, hh, ww, c = x.shape
        h = VAEGroupNorm(name="norm")(x)
        q = nn.Conv(c, (1, 1), dtype=self.dtype, name="q")(h).reshape(b, hh * ww, c)
        k = nn.Conv(c, (1, 1), dtype=self.dtype, name="k")(h).reshape(b, hh * ww, c)
        v = nn.Conv(c, (1, 1), dtype=self.dtype, name="v")(h).reshape(b, hh * ww, c)
        t = hh * ww
        # single-head attention over c-dim tokens: the kernel's D ceiling
        # is 512 here (multi-lane-tile blocks), vs 128 for multi-head sites
        from ..ops import resolve_use_flash
        flash = resolve_use_flash(self.use_flash, t, t, c, max_head_dim=512)
        if flash:
            from ..ops import flash_attention
            h = flash_attention(q[:, None], k[:, None], v[:, None]
                                )[:, 0].reshape(b, hh, ww, c)
        else:
            # f32 ACCUMULATION of the logits (not a post-hoc cast of bf16
            # sums) — keeps the einsum path numerically aligned with the
            # flash kernel's f32 logits across the auto switch point
            w = jnp.einsum("btc,bsc->bts", q, k,
                           preferred_element_type=jnp.float32) * (c ** -0.5)
            w = jax.nn.softmax(w, axis=-1).astype(v.dtype)
            h = jnp.einsum("bts,bsc->btc", w, v).reshape(b, hh, ww, c)
        h = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_out")(h)
        return x + h


class VAEDownsample(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # torch pads (0,1,0,1) then conv stride 2 pad 0 (model.py:110-118)
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(x.shape[-1], (3, 3), strides=(2, 2), padding=0,
                       dtype=self.dtype, name="conv")(x)


class VAEUpsample(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        # broadcast+reshape 2x nearest: identical values to
        # jax.image.resize(method="nearest") but lowers to a copy, not a
        # gather (4.3x faster on v5e, BENCH_NOTES.md) — this runs on the
        # decoder's largest activations at 512px
        x = jnp.broadcast_to(x[:, :, None, :, None, :],
                             (b, h, 2, w, 2, c)).reshape(b, 2 * h, 2 * w, c)
        return nn.Conv(c, (3, 3), padding=1, dtype=self.dtype, name="conv")(x)


class Encoder(nn.Module):
    ch: int = 128
    ch_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    attn_at_ds: Tuple[int, ...] = ()      # downsample ratios with attention
    z_channels: int = 4
    double_z: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.ch, (3, 3), padding=1, dtype=self.dtype,
                    name="conv_in")(x.astype(self.dtype))
        ds = 1
        for level, mult in enumerate(self.ch_mult):
            for i in range(self.num_res_blocks):
                h = VAEResnetBlock(self.ch * mult, dtype=self.dtype,
                                   name=f"down_{level}_block_{i}")(h)
                if ds in self.attn_at_ds:
                    h = VAEAttnBlock(dtype=self.dtype,
                                     name=f"down_{level}_attn_{i}")(h)
            if level != len(self.ch_mult) - 1:
                h = VAEDownsample(dtype=self.dtype, name=f"down_{level}_ds")(h)
                ds *= 2
        h = VAEResnetBlock(dtype=self.dtype, name="mid_block_1")(h)
        h = VAEAttnBlock(dtype=self.dtype, name="mid_attn_1")(h)
        h = VAEResnetBlock(dtype=self.dtype, name="mid_block_2")(h)
        h = VAEGroupNorm(name="norm_out")(h, act="silu")
        out_ch = 2 * self.z_channels if self.double_z else self.z_channels
        return nn.Conv(out_ch, (3, 3), padding=1, dtype=jnp.float32,
                       param_dtype=jnp.float32, name="conv_out")(
            h.astype(jnp.float32))


class Decoder(nn.Module):
    ch: int = 128
    out_ch: int = 3
    ch_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    attn_at_ds: Tuple[int, ...] = ()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        block_in = self.ch * self.ch_mult[-1]
        h = nn.Conv(block_in, (3, 3), padding=1, dtype=self.dtype,
                    name="conv_in")(z.astype(self.dtype))
        h = VAEResnetBlock(dtype=self.dtype, name="mid_block_1")(h)
        h = VAEAttnBlock(dtype=self.dtype, name="mid_attn_1")(h)
        h = VAEResnetBlock(dtype=self.dtype, name="mid_block_2")(h)
        ds = 2 ** (len(self.ch_mult) - 1)
        for level, mult in list(enumerate(self.ch_mult))[::-1]:
            for i in range(self.num_res_blocks + 1):
                h = VAEResnetBlock(self.ch * mult, dtype=self.dtype,
                                   name=f"up_{level}_block_{i}")(h)
                if ds in self.attn_at_ds:
                    h = VAEAttnBlock(dtype=self.dtype,
                                     name=f"up_{level}_attn_{i}")(h)
            if level != 0:
                h = VAEUpsample(dtype=self.dtype, name=f"up_{level}_us")(h)
                ds //= 2
        h = VAEGroupNorm(name="norm_out")(h, act="silu")
        return nn.Conv(self.out_ch, (3, 3), padding=1, dtype=jnp.float32,
                       param_dtype=jnp.float32, name="conv_out")(
            h.astype(jnp.float32))


class VectorQuantizer(nn.Module):
    """Nearest-codebook lookup — the inference path of taming's
    VectorQuantizer2 used by the LDM VQ first stages
    (autoencoder.py:6,39-41): argmin over squared distances to the
    embedding rows, then embed. The straight-through estimator and
    commitment-loss terms are training-only and do not change the
    forward value."""

    n_embed: int
    embed_dim: int

    @nn.compact
    def __call__(self, z):
        emb = self.param(
            "embedding",
            lambda k, s: jax.random.uniform(
                k, s, jnp.float32, -1.0 / self.n_embed, 1.0 / self.n_embed),
            (self.n_embed, self.embed_dim))
        flat = z.reshape(-1, self.embed_dim).astype(jnp.float32)
        d = ((flat ** 2).sum(-1, keepdims=True) + (emb ** 2).sum(-1)
             - 2.0 * flat @ emb.T)
        idx = jnp.argmin(d, axis=-1)
        return jnp.take(emb, idx, axis=0).reshape(z.shape).astype(z.dtype)


class VQModelInterface(nn.Module):
    """VQ first stage for latent-diffusion models (vq-f4/vq-f8 configs:
    celebahq/ffhq/lsun_bedrooms-ldm-vq-4, cin-ldm-vq-f8).

    Mirrors ldm/models/autoencoder.py:264-282 VQModelInterface — encode
    returns the PRE-quantization latent (Encoder + quant_conv only); the
    diffusion model operates on it and decode quantizes on the way out
    (quantize -> post_quant_conv -> Decoder) unless force_not_quantize.
    """

    ch: int = 128
    out_ch: int = 3
    ch_mult: Tuple[int, ...] = (1, 2, 4)
    num_res_blocks: int = 2
    attn_at_ds: Tuple[int, ...] = ()
    z_channels: int = 3
    embed_dim: int = 3
    n_embed: int = 8192
    dtype: Dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(ch=self.ch, ch_mult=self.ch_mult,
                               num_res_blocks=self.num_res_blocks,
                               attn_at_ds=self.attn_at_ds,
                               z_channels=self.z_channels, double_z=False,
                               dtype=self.dtype)
        self.decoder = Decoder(ch=self.ch, out_ch=self.out_ch,
                               ch_mult=self.ch_mult,
                               num_res_blocks=self.num_res_blocks,
                               attn_at_ds=self.attn_at_ds, dtype=self.dtype)
        self.quantize = VectorQuantizer(n_embed=self.n_embed,
                                        embed_dim=self.embed_dim)
        self.quant_conv = nn.Conv(self.embed_dim, (1, 1), name="quant_conv")
        self.post_quant_conv = nn.Conv(self.z_channels, (1, 1),
                                       name="post_quant_conv")

    def encode(self, x):
        return self.quant_conv(self.encoder(x))

    def decode(self, h, force_not_quantize: bool = False):
        quant = h if force_not_quantize else self.quantize(h)
        return self.decoder(self.post_quant_conv(quant))

    def __call__(self, x):
        return self.decode(self.encode(x))


class AutoencoderKL(nn.Module):
    """encode -> (mean, logvar); decode(z * 1/scale handled by caller)."""

    ch: int = 128
    out_ch: int = 3
    ch_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    attn_at_ds: Tuple[int, ...] = ()
    z_channels: int = 4
    embed_dim: int = 4
    dtype: Dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(ch=self.ch, ch_mult=self.ch_mult,
                               num_res_blocks=self.num_res_blocks,
                               attn_at_ds=self.attn_at_ds,
                               z_channels=self.z_channels, dtype=self.dtype)
        self.decoder = Decoder(ch=self.ch, out_ch=self.out_ch,
                               ch_mult=self.ch_mult,
                               num_res_blocks=self.num_res_blocks,
                               attn_at_ds=self.attn_at_ds, dtype=self.dtype)
        self.quant_conv = nn.Conv(2 * self.embed_dim, (1, 1), name="quant_conv")
        self.post_quant_conv = nn.Conv(self.z_channels, (1, 1),
                                       name="post_quant_conv")

    def encode(self, x):
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def decode(self, z):
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x, rng=None, sample_posterior: bool = False):
        mean, logvar = self.encode(x)
        if sample_posterior:
            z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(rng, mean.shape)
        else:
            z = mean
        return self.decode(z), mean, logvar
