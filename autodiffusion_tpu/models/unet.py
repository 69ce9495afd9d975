"""ADM UNet family in flax/linen, NHWC, with first-class layer masking.

Re-design of guided_diffusion/unet.py:396-896 and dynamic_unet.py:507-702 as
one model: every prunable block (ResBlock / AttentionBlock) has a static
``layer_id`` assigned in construction order — identical numbering to
Dynamic_UNetModel (dynamic_unet.py:507-655) so published ``skip_layers``
artifacts transfer — and the forward pass takes an optional ``keep_mask``
vector of shape [layer_num].

TPU-first skip semantics: the reference short-circuits a skipped ResBlock to
``skip_connection(x_upd(x))`` and a skipped AttentionBlock to identity
(dynamic_unet.py:245-249,316-318). Both are exactly ``residual_branch * 0``,
so skipping is implemented as multiplying the residual branch by
``keep_mask[layer_id]`` — a single compiled graph (no retrace, no dynamic
control flow) serves every architecture candidate during search. For
deployment-time real speedups, pass ``structural_skip`` (a static frozenset)
instead, which removes the branches at trace time at the cost of one
compilation per architecture.
"""

from __future__ import annotations

from typing import Any, FrozenSet, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .nn import (Conv3x3, Downsample, GroupNorm32, Upsample,
                 timestep_embedding, zero_init)

Dtype = Any


# trace-time sentinel: the block's residual branch is NOT built at all —
# a float multiply-by-zero would keep the convs/attention in the compiled
# program (XLA only folds x*0 for integral types), defeating the
# deployment speedup structural_skip exists for
STRUCTURAL_SKIP = object()


def _keep_factor(keep_mask, layer_id: int, structural_skip, dtype):
    """None = statically kept; STRUCTURAL_SKIP = removed at trace time;
    else a dynamic 0/1 factor.

    keep_mask may be [layer_num] (one architecture for the whole batch) or
    [B, layer_num] (per-sample architectures — used when candidates are
    folded into the batch axis for search)."""
    if structural_skip is not None and layer_id in structural_skip:
        return STRUCTURAL_SKIP
    if keep_mask is None:
        return None
    if keep_mask.ndim == 2:
        return keep_mask[:, layer_id].astype(dtype)   # [B]
    return keep_mask[layer_id].astype(dtype)          # scalar


def _apply_keep(h: jnp.ndarray, keep) -> jnp.ndarray:
    if keep is None:
        return h
    assert keep is not STRUCTURAL_SKIP, \
        "structurally skipped blocks must early-return before _apply_keep"
    return h * keep.reshape(keep.shape + (1,) * (h.ndim - keep.ndim))


class ResBlock(nn.Module):
    """Residual block with FiLM (scale-shift) timestep conditioning.

    Mirrors unet.py:143-256 / dynamic_unet.py:179-271: GN->SiLU->conv input
    path (with optional up/down resampling applied to both h and x),
    embedding MLP producing scale/shift, GN*(1+scale)+shift -> SiLU ->
    dropout -> zero-init conv, plus a 1x1-conv (or identity) skip connection.
    """

    out_channels: Optional[int] = None
    dropout: float = 0.0
    use_scale_shift_norm: bool = True
    up: bool = False
    down: bool = False
    use_conv_skip: bool = False   # 3x3 conv skip instead of 1x1 (use_conv in ref)
    # "auto" defers to the env-gated Pallas fused-norm kernel (off by
    # default); the classifier opts in for its bandwidth-bound VJP
    fused_norm: Any = "auto"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, emb, *, keep=None, deterministic: bool = True):
        c_in = x.shape[-1]
        c_out = self.out_channels or c_in

        if keep is STRUCTURAL_SKIP:
            # true removal: only the skip path runs (keeping the up/down
            # resample and channel projection, the exact semantics of a
            # skipped dynamic block, dynamic_unet.py:245-249); the
            # residual branch's ops never enter the compiled program
            if self.up:
                x = Upsample(use_conv=False, dtype=self.dtype, name="x_upd")(x)
            elif self.down:
                x = Downsample(use_conv=False, dtype=self.dtype,
                               name="x_upd")(x)
            if c_out == c_in:
                return x
            if self.use_conv_skip:
                return Conv3x3(c_out, dtype=self.dtype, name="skip")(x)
            return nn.Conv(c_out, (1, 1), dtype=self.dtype, name="skip")(x)

        # norm-act-conv fusion (ops/conv_im2col.py conv3x3_fused, behind
        # ADT_FUSED_CONV): legal when the norm feeds the conv directly —
        # no up/down resample between them, and dropout a no-op. Gate off
        # => the exact pre-existing composition, bit for bit.
        from ..ops.conv_im2col import resolve_use_fused_conv
        hw = x.shape[1:3]
        cdtype = jnp.bfloat16 if self.dtype == jnp.bfloat16 else jnp.float32
        fuse_in = (not (self.up or self.down)
                   and resolve_use_fused_conv("auto", hw[0], hw[1], c_in,
                                              c_out, cdtype))
        # out_conv runs at the post-resample resolution for up/down blocks;
        # gate on that shape so it matches Conv3x3's internal re-resolution
        if self.up:
            out_hw = (hw[0] * 2, hw[1] * 2)
        elif self.down:
            out_hw = (hw[0] // 2, hw[1] // 2)
        else:
            out_hw = hw
        fuse_out = ((deterministic or self.dropout == 0)
                    and resolve_use_fused_conv("auto", out_hw[0], out_hw[1],
                                               c_out, c_out, cdtype))

        in_norm = GroupNorm32(use_fused=self.fused_norm, name="in_norm")
        in_conv = Conv3x3(c_out, dtype=self.dtype, name="in_conv")
        if fuse_in:
            h = in_conv(x, affine=in_norm(x, return_affine=True))
        else:
            h = in_norm(x, act="silu")
            if self.up:
                h = Upsample(use_conv=False, dtype=self.dtype, name="h_upd")(h)
            elif self.down:
                h = Downsample(use_conv=False, dtype=self.dtype,
                               name="h_upd")(h)
            h = in_conv(h)
        if self.up:
            x = Upsample(use_conv=False, dtype=self.dtype, name="x_upd")(x)
        elif self.down:
            x = Downsample(use_conv=False, dtype=self.dtype, name="x_upd")(x)

        emb_out = nn.Dense(2 * c_out if self.use_scale_shift_norm else c_out,
                           dtype=self.dtype, name="emb_proj")(nn.silu(emb))
        out_norm = GroupNorm32(use_fused=self.fused_norm, name="out_norm")
        out_conv = Conv3x3(c_out, kernel_init=zero_init, dtype=self.dtype,
                           name="out_conv")
        scale = shift = None
        if self.use_scale_shift_norm:
            scale, shift = jnp.split(emb_out, 2, axis=-1)        # [B, c_out]
        else:
            h = h + emb_out[:, None, None, :]

        if c_out == c_in:
            skip = x
        elif self.use_conv_skip:
            skip = Conv3x3(c_out, dtype=self.dtype, name="skip")(x)
        else:
            skip = nn.Conv(c_out, (1, 1), dtype=self.dtype, name="skip")(x)

        if fuse_out:
            aff = out_norm(h, scale=scale, shift=shift, return_affine=True)
            if keep is None:
                # the residual rides the conv's own output pass
                return out_conv(h, affine=aff, residual=skip)
            return skip + _apply_keep(out_conv(h, affine=aff), keep)

        h = out_norm(h, scale=scale, shift=shift, act="silu")
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = out_conv(h)
        return skip + _apply_keep(h, keep)


class AttentionBlock(nn.Module):
    """Spatial self-attention with residual, unet.py:259-393.

    ``new_order`` selects how the fused qkv projection's channel axis is
    interpreted — QKVAttention ([q|k|v] blocks, heads-major inside each) vs
    QKVAttentionLegacy (heads-major, [q|k|v] inside each head). The math is
    identical; the layout matters for weight conversion from published
    checkpoints. The 1/sqrt(sqrt(d)) double-scaling trick (applied to both q
    and k, unet.py:355-361) is kept: softmax runs in float32 anyway, but the
    split scaling preserves bit-level parity of the logits.
    """

    num_heads: int = 1
    num_head_channels: int = -1
    new_order: bool = True
    # "auto": Pallas flash kernel on TPU for long token sequences (see
    # models/attention.py and BENCH_NOTES.md); False forces einsum
    use_flash: Any = "auto"
    fused_norm: Any = "auto"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, keep=None):
        if keep is STRUCTURAL_SKIP:
            return x          # skipped attention is identity (dynamic_unet.py:316-318)
        b, hgt, wid, c = x.shape
        if self.num_head_channels == -1:
            heads = self.num_heads
        else:
            assert c % self.num_head_channels == 0, (c, self.num_head_channels)
            heads = c // self.num_head_channels
        hd = c // heads
        tokens = hgt * wid
        from ..ops import resolve_use_flash
        flash = resolve_use_flash(self.use_flash, tokens, tokens, hd)

        xf = x.reshape(b, hgt * wid, c)
        qkv = nn.DenseGeneral(3 * c, dtype=self.dtype, name="qkv")(
            GroupNorm32(use_fused=self.fused_norm, name="norm")(xf))
        if self.new_order:
            q, k, v = jnp.split(qkv, 3, axis=-1)                       # [b,t,c] each
            q = q.reshape(b, -1, heads, hd)
            k = k.reshape(b, -1, heads, hd)
            v = v.reshape(b, -1, heads, hd)
        else:
            qkv = qkv.reshape(b, -1, heads, 3 * hd)
            q, k, v = jnp.split(qkv, 3, axis=-1)                       # [b,t,h,hd]

        if flash:
            from ..ops import flash_attention
            a = flash_attention(q.transpose(0, 2, 1, 3),
                                k.transpose(0, 2, 1, 3),
                                v.transpose(0, 2, 1, 3))
            a = a.transpose(0, 2, 1, 3).reshape(b, -1, c)
        else:
            scale = 1.0 / np.sqrt(np.sqrt(hd))
            logits = jnp.einsum("bthd,bshd->bhts",
                                (q * scale).astype(jnp.float32),
                                (k * scale).astype(jnp.float32))
            weights = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
            a = jnp.einsum("bhts,bshd->bthd", weights, v).reshape(b, -1, c)
        a = nn.DenseGeneral(c, kernel_init=zero_init, dtype=self.dtype,
                            name="proj_out")(a)
        return x + _apply_keep(a, keep).reshape(b, hgt, wid, c)


class AttentionPool2d(nn.Module):
    """CLIP-style attention pooling head for the classifier (unet.py:42-68)."""

    num_heads: int
    output_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        xf = x.reshape(b, h * w, c)
        xf = jnp.concatenate([xf.mean(axis=1, keepdims=True), xf], axis=1)
        pos = self.param("positional_embedding",
                         nn.initializers.normal(1.0 / c ** 0.5),
                         (h * w + 1, c), jnp.float32)
        xf = xf + pos[None].astype(xf.dtype)
        qkv = nn.DenseGeneral(3 * c, dtype=self.dtype, name="qkv_proj")(xf)
        heads, hd = self.num_heads, c // self.num_heads
        # QKVAttention (new order): split into q|k|v blocks first (unet.py:38-41)
        q, k, v = (t.reshape(b, -1, heads, hd) for t in jnp.split(qkv, 3, axis=-1))
        scale = 1.0 / np.sqrt(np.sqrt(hd))
        logits = jnp.einsum("bthd,bshd->bhts",
                            (q * scale).astype(jnp.float32),
                            (k * scale).astype(jnp.float32))
        weights = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        a = jnp.einsum("bhts,bshd->bthd", weights, v).reshape(b, -1, c)
        a = nn.DenseGeneral(self.output_dim, dtype=self.dtype, name="c_proj")(a)
        return a[:, 0]


def unet_layer_count(num_res_blocks: int, channel_mult: Sequence[float],
                     attention_ds: Sequence[int], resblock_updown: bool) -> int:
    """Total prunable layers, matching dynamic_unet.py:507-655's counter.

    For the ADM-64 config (3 res blocks, mult (1,2,3,4), attn ds {2,4,8},
    resblock_updown) this yields 58, verified against the reference
    Dynamic_UNetModel.layer_num and consistent with skip indices up to 56 in
    the published artifacts.
    """
    n = 0
    ds = 1
    for level in range(len(channel_mult)):
        for _ in range(num_res_blocks):
            n += 1
            if ds in attention_ds:
                n += 1
        if level != len(channel_mult) - 1:
            if resblock_updown:
                n += 1
            ds *= 2
    n += 3  # middle: ResBlock, Attention, ResBlock
    for level in list(range(len(channel_mult)))[::-1]:
        for i in range(num_res_blocks + 1):
            n += 1
            if ds in attention_ds:
                n += 1
            if level and i == num_res_blocks:
                if resblock_updown:
                    n += 1
                ds //= 2
    return n


class UNetModel(nn.Module):
    """The ADM UNet (unet.py:396-665), unified with its dynamic variant.

    Args to __call__:
      x:     [B, H, W, in_channels] NHWC
      timesteps: [B] original-process timesteps (float or int)
      y:     optional [B] int class labels (required iff num_classes set)
      keep_mask: optional [layer_num] float/bool — 1 keeps a block's residual
             branch, 0 skips it (search-time architecture masking)
      structural_skip: optional frozenset of layer_ids removed at trace time
             (deployment-time pruning; triggers recompilation per arch)
    Returns [B, H, W, out_channels] in float32.
    """

    model_channels: int
    out_channels: int
    num_res_blocks: int
    attention_ds: Tuple[int, ...] = (2, 4, 8)
    channel_mult: Tuple[float, ...] = (1, 2, 3, 4)
    dropout: float = 0.0
    num_classes: Optional[int] = None
    num_heads: int = 1
    num_head_channels: int = -1
    num_heads_upsample: int = -1
    use_scale_shift_norm: bool = True
    resblock_updown: bool = True
    use_new_attention_order: bool = True
    conv_resample: bool = True
    # rematerialize ResBlocks under grad (the reference's use_checkpoint,
    # nn.py:124-170) — trades recompute for activation memory at 256px+
    use_remat: bool = False
    dtype: Dtype = jnp.float32

    @property
    def layer_num(self) -> int:
        return unet_layer_count(self.num_res_blocks, self.channel_mult,
                                self.attention_ds, self.resblock_updown)

    @nn.compact
    def __call__(self, x, timesteps, y=None, *, keep_mask=None,
                 structural_skip: Optional[FrozenSet[int]] = None,
                 deterministic: bool = True):
        assert (y is not None) == (self.num_classes is not None), \
            "must specify y exactly when the model is class-conditional"
        if keep_mask is not None:
            # JAX clamps out-of-bounds gathers silently; catch bad masks here
            assert keep_mask.shape[-1] == self.layer_num, \
                f"keep_mask must have length {self.layer_num}, got {keep_mask.shape}"
        heads_up = self.num_heads if self.num_heads_upsample == -1 else self.num_heads_upsample

        time_embed_dim = self.model_channels * 4
        emb = timestep_embedding(timesteps, self.model_channels, dtype=jnp.float32)
        emb = nn.Dense(time_embed_dim, dtype=self.dtype, name="time_embed_0")(emb)
        emb = nn.Dense(time_embed_dim, dtype=self.dtype, name="time_embed_2")(nn.silu(emb))
        if self.num_classes is not None:
            emb = emb + nn.Embed(self.num_classes, time_embed_dim,
                                 dtype=self.dtype, name="label_emb")(y)

        x = x.astype(self.dtype)
        layer_id = 0

        def keep_for(lid):
            return _keep_factor(keep_mask, lid, structural_skip, self.dtype)

        if self.use_remat:
            # deterministic stays a static closure capture; only arrays
            # (h, emb, keep) flow through the checkpoint boundary
            def _call(block, hh, ee, kk):
                return block(hh, ee, keep=kk, deterministic=deterministic)

            _rematted = nn.remat(_call)

            def call_res(block, hh, ee, kk):
                if kk is STRUCTURAL_SKIP:
                    # the sentinel is a plain object, not a JAX type —
                    # remat would reject it as a traced argument; the
                    # skipped block is only the resample/projection path,
                    # so there is nothing worth rematerializing anyway
                    return _call(block, hh, ee, kk)
                return _rematted(block, hh, ee, kk)
        else:
            def call_res(block, hh, ee, kk):
                return block(hh, ee, keep=kk, deterministic=deterministic)

        def res(h, c_out, lid, name, up=False, down=False):
            block = ResBlock(out_channels=c_out, dropout=self.dropout,
                             use_scale_shift_norm=self.use_scale_shift_norm,
                             up=up, down=down, dtype=self.dtype, name=name)
            return call_res(block, h, emb, keep_for(lid))

        def attn(h, lid, name, heads=None):
            return AttentionBlock(num_heads=heads or self.num_heads,
                                  num_head_channels=self.num_head_channels,
                                  new_order=self.use_new_attention_order,
                                  dtype=self.dtype, name=name)(h, keep=keep_for(lid))

        ch = int(self.channel_mult[0] * self.model_channels)
        h = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype, name="in_conv")(x)
        hs = [h]
        ds = 1
        for level, mult in enumerate(self.channel_mult):
            for i in range(self.num_res_blocks):
                ch = int(mult * self.model_channels)
                h = res(h, ch, layer_id, f"down_{level}_{i}_res"); layer_id += 1
                if ds in self.attention_ds:
                    h = attn(h, layer_id, f"down_{level}_{i}_attn"); layer_id += 1
                hs.append(h)
            if level != len(self.channel_mult) - 1:
                if self.resblock_updown:
                    h = res(h, ch, layer_id, f"down_{level}_ds", down=True); layer_id += 1
                else:
                    h = Downsample(out_channels=ch, use_conv=self.conv_resample,
                                   dtype=self.dtype, name=f"down_{level}_ds")(h)
                hs.append(h)
                ds *= 2

        h = res(h, ch, layer_id, "mid_res0"); layer_id += 1
        h = attn(h, layer_id, "mid_attn"); layer_id += 1
        h = res(h, ch, layer_id, "mid_res1"); layer_id += 1

        for level, mult in list(enumerate(self.channel_mult))[::-1]:
            for i in range(self.num_res_blocks + 1):
                h = jnp.concatenate([h, hs.pop()], axis=-1)
                ch = int(mult * self.model_channels)
                h = res(h, ch, layer_id, f"up_{level}_{i}_res"); layer_id += 1
                if ds in self.attention_ds:
                    h = attn(h, layer_id, f"up_{level}_{i}_attn", heads=heads_up)
                    layer_id += 1
                if level and i == self.num_res_blocks:
                    if self.resblock_updown:
                        h = res(h, ch, layer_id, f"up_{level}_us", up=True); layer_id += 1
                    else:
                        h = Upsample(out_channels=ch, use_conv=self.conv_resample,
                                     dtype=self.dtype, name=f"up_{level}_us")(h)
                    ds //= 2

        assert not hs
        assert layer_id == self.layer_num, (layer_id, self.layer_num)
        h = GroupNorm32(name="out_norm")(h, act="silu")
        h = nn.Conv(self.out_channels, (3, 3), padding=1, kernel_init=zero_init,
                    dtype=jnp.float32, param_dtype=jnp.float32, name="out_conv")(
            h.astype(jnp.float32))
        return h


class SuperResModel(nn.Module):
    """Super-resolution wrapper: concat bilinear-upsampled low-res input
    (unet.py:668-682)."""

    unet: UNetModel

    def __call__(self, x, timesteps, low_res, y=None, **kwargs):
        b, h, w, _ = x.shape
        up = jax.image.resize(low_res, (b, h, w, low_res.shape[-1]), "bilinear")
        return self.unet(jnp.concatenate([x, up], axis=-1), timesteps, y, **kwargs)


class EncoderUNetModel(nn.Module):
    """Half-UNet classifier (unet.py:685-896): encoder trunk + pooling head.

    ``pool`` is one of adaptive / attention / spatial / spatial_v2. The ADM
    noisy classifier uses attention pooling.
    """

    model_channels: int
    out_channels: int
    num_res_blocks: int
    attention_ds: Tuple[int, ...] = (2, 4, 8)
    channel_mult: Tuple[float, ...] = (1, 2, 3, 4)
    dropout: float = 0.0
    num_heads: int = 1
    num_head_channels: int = -1
    use_scale_shift_norm: bool = True
    resblock_updown: bool = True
    use_new_attention_order: bool = True
    pool: str = "attention"
    conv_resample: bool = True
    # fused Pallas GroupNorm(+FiLM+SiLU) with its one-pass custom VJP — the
    # classifier's fwd+VJP under guidance is HBM-bandwidth-bound, where the
    # kernel's smaller residual footprint pays (see BENCH_NOTES.md)
    fused_norm: Any = "auto"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, timesteps, *, deterministic: bool = True):
        time_embed_dim = self.model_channels * 4
        emb = timestep_embedding(timesteps, self.model_channels, dtype=jnp.float32)
        emb = nn.Dense(time_embed_dim, dtype=self.dtype, name="time_embed_0")(emb)
        emb = nn.Dense(time_embed_dim, dtype=self.dtype, name="time_embed_2")(nn.silu(emb))

        in_dtype = x.dtype
        x = x.astype(self.dtype)
        ch = int(self.channel_mult[0] * self.model_channels)
        results = []

        def pool_point(h):
            # reference pools after EVERY input_blocks module — conv_in,
            # each ResBlock(+Attention) pair, each downsample — and the
            # middle block, cast back to the input dtype before the mean
            # (unet.py:880-891: h.type(x.dtype).mean(dim=(2,3)))
            if self.pool.startswith("spatial"):
                results.append(h.astype(in_dtype).mean(axis=(1, 2)))

        h = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype, name="in_conv")(x)
        pool_point(h)
        ds = 1
        for level, mult in enumerate(self.channel_mult):
            for i in range(self.num_res_blocks):
                ch = int(mult * self.model_channels)
                h = ResBlock(out_channels=ch, dropout=self.dropout,
                     fused_norm=self.fused_norm,
                             use_scale_shift_norm=self.use_scale_shift_norm,
                             dtype=self.dtype, name=f"down_{level}_{i}_res")(
                    h, emb, deterministic=deterministic)
                if ds in self.attention_ds:
                    h = AttentionBlock(num_heads=self.num_heads, fused_norm=self.fused_norm,
                                       num_head_channels=self.num_head_channels,
                                       new_order=self.use_new_attention_order,
                                       dtype=self.dtype,
                                       name=f"down_{level}_{i}_attn")(h)
                pool_point(h)
            if level != len(self.channel_mult) - 1:
                if self.resblock_updown:
                    h = ResBlock(out_channels=ch, dropout=self.dropout,
                     fused_norm=self.fused_norm,
                                 use_scale_shift_norm=self.use_scale_shift_norm,
                                 down=True, dtype=self.dtype,
                                 name=f"down_{level}_ds")(h, emb,
                                                          deterministic=deterministic)
                else:
                    h = Downsample(out_channels=ch, use_conv=self.conv_resample,
                                   dtype=self.dtype, name=f"down_{level}_ds")(h)
                pool_point(h)
                ds *= 2

        h = ResBlock(out_channels=ch, dropout=self.dropout,
                     fused_norm=self.fused_norm,
                     use_scale_shift_norm=self.use_scale_shift_norm,
                     dtype=self.dtype, name="mid_res0")(h, emb,
                                                        deterministic=deterministic)
        h = AttentionBlock(num_heads=self.num_heads, fused_norm=self.fused_norm,
                           num_head_channels=self.num_head_channels,
                           new_order=self.use_new_attention_order,
                           dtype=self.dtype, name="mid_attn")(h)
        h = ResBlock(out_channels=ch, dropout=self.dropout,
                     fused_norm=self.fused_norm,
                     use_scale_shift_norm=self.use_scale_shift_norm,
                     dtype=self.dtype, name="mid_res1")(h, emb,
                                                        deterministic=deterministic)

        if self.pool == "adaptive":
            h = GroupNorm32(use_fused=self.fused_norm, name="out_norm")(h, act="silu")
            h = h.mean(axis=(1, 2), keepdims=True)
            h = nn.Conv(self.out_channels, (1, 1), kernel_init=zero_init,
                        dtype=jnp.float32, name="out_conv")(h.astype(jnp.float32))
            return h.reshape(h.shape[0], -1)
        if self.pool == "attention":
            h = GroupNorm32(use_fused=self.fused_norm, name="out_norm")(h, act="silu")
            heads = (ch // self.num_head_channels
                     if self.num_head_channels != -1 else self.num_heads)
            return AttentionPool2d(num_heads=heads, output_dim=self.out_channels,
                                   dtype=self.dtype, name="out_pool")(h).astype(jnp.float32)
        if self.pool.startswith("spatial"):
            results.append(h.astype(jnp.float32).mean(axis=(1, 2)))
            h = jnp.concatenate(results, axis=-1).astype(jnp.float32)
            h = nn.Dense(2048, name="out_fc0")(h)
            if self.pool == "spatial_v2":
                h = GroupNorm32(num_groups=32, name="out_norm")(
                    h[:, None, None, :], act="silu")[:, 0, 0]
            else:
                h = nn.relu(h)
            return nn.Dense(self.out_channels, name="out_fc1")(h)
        raise NotImplementedError(self.pool)
