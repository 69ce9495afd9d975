"""CompVis Stable Diffusion checkpoint -> flax params converters.

Maps the three towers of a ``sd-v1-*.ckpt`` state dict (loaded with
strict=False like the reference, sd/scripts/search_ea.py:55-72):
  model.diffusion_model.*     -> models.sd_unet.SDUNetModel
  first_stage_model.*         -> models.vae.AutoencoderKL
  cond_stage_model.transformer.* -> models.clip_text.CLIPTextEncoder
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

from .clip_text import CLIPTextConfig, convert_clip_text
from .sd_unet import SDUNetModel
from .vae import AutoencoderKL

__all__ = ["convert_sd_unet", "convert_vae", "convert_vq",
           "split_sd_checkpoint", "save_sd_params_dir",
           "load_sd_params_dir"]


# torch->flax layout helpers shared with the ADM converter — one
# implementation so layout fixes cannot drift between the two trees
from .convert import _conv, _dense, _gn, _np, _resblock  # noqa: F401


def _ln(sd, p):
    return {"scale": _np(sd, p + ".weight"), "bias": _np(sd, p + ".bias")}


def _xattn(sd, p):
    return {
        "to_q": _dense(sd, p + ".to_q", bias=False),
        "to_k": _dense(sd, p + ".to_k", bias=False),
        "to_v": _dense(sd, p + ".to_v", bias=False),
        "to_out": _dense(sd, p + ".to_out.0"),
    }


def _spatial_transformer(sd, p, depth):
    out = {
        "norm": _gn(sd, p + ".norm"),
        "proj_in": _conv(sd, p + ".proj_in"),
        "proj_out": _conv(sd, p + ".proj_out"),
    }
    for d in range(depth):
        bp = f"{p}.transformer_blocks.{d}"
        out[f"block_{d}"] = {
            "attn1": _xattn(sd, bp + ".attn1"),
            "attn2": _xattn(sd, bp + ".attn2"),
            "ff": {"geglu": {"proj": _dense(sd, bp + ".ff.net.0.proj")},
                   "out": _dense(sd, bp + ".ff.net.2")},
            "norm1": _ln(sd, bp + ".norm1"),
            "norm2": _ln(sd, bp + ".norm2"),
            "norm3": _ln(sd, bp + ".norm3"),
        }
    return out


def convert_sd_unet(sd: Mapping[str, np.ndarray], model: SDUNetModel,
                    prefix: str = "model.diffusion_model.") -> dict:
    """openaimodel.UNetModel walk (openaimodel.py:413-744)."""
    g = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)} \
        if prefix else dict(sd)
    mc = model.model_channels
    params: Dict[str, Any] = {
        "time_embed_0": _dense(g, "time_embed.0"),
        "time_embed_2": _dense(g, "time_embed.2"),
        "in_conv": _conv(g, "input_blocks.0.0"),
    }
    ch = mc
    idx, ds = 1, 1
    for level, mult in enumerate(model.channel_mult):
        for i in range(model.num_res_blocks):
            c_out = mult * mc
            params[f"down_{level}_{i}_res"] = _resblock(
                g, f"input_blocks.{idx}.0", has_skip=(c_out != ch))
            ch = c_out
            if ds in model.attention_ds:
                params[f"down_{level}_{i}_attn"] = _spatial_transformer(
                    g, f"input_blocks.{idx}.1", model.transformer_depth)
            idx += 1
        if level != len(model.channel_mult) - 1:
            params[f"down_{level}_ds"] = {"op": _conv(g, f"input_blocks.{idx}.0.op")}
            idx += 1
            ds *= 2

    params["mid_res0"] = _resblock(g, "middle_block.0", has_skip=False)
    params["mid_attn"] = _spatial_transformer(g, "middle_block.1",
                                              model.transformer_depth)
    params["mid_res1"] = _resblock(g, "middle_block.2", has_skip=False)

    input_chans = [mc]
    c = mc
    for level, mult in enumerate(model.channel_mult):
        for _ in range(model.num_res_blocks):
            c = mult * mc
            input_chans.append(c)
        if level != len(model.channel_mult) - 1:
            input_chans.append(c)

    j = 0
    for level, mult in list(enumerate(model.channel_mult))[::-1]:
        for i in range(model.num_res_blocks + 1):
            ich = input_chans.pop()
            c_out = mult * mc
            params[f"up_{level}_{i}_res"] = _resblock(
                g, f"output_blocks.{j}.0", has_skip=(c_out != ch + ich))
            ch = c_out
            sub = 1
            if ds in model.attention_ds:
                params[f"up_{level}_{i}_attn"] = _spatial_transformer(
                    g, f"output_blocks.{j}.{sub}", model.transformer_depth)
                sub += 1
            if level and i == model.num_res_blocks:
                params[f"up_{level}_us"] = {
                    "conv": _conv(g, f"output_blocks.{j}.{sub}.conv")}
                ds //= 2
            j += 1

    params["out_norm"] = _gn(g, "out.0")
    params["out_conv"] = _conv(g, "out.2")
    return {"params": params}


def _vae_gn(sd, p):
    return {"gn": {"GroupNorm_0": {"scale": _np(sd, p + ".weight"),
                                   "bias": _np(sd, p + ".bias")}}}


def _vae_res(sd, p, has_skip):
    out = {
        "norm1": _vae_gn(sd, p + ".norm1"),
        "conv1": _conv(sd, p + ".conv1"),
        "norm2": _vae_gn(sd, p + ".norm2"),
        "conv2": _conv(sd, p + ".conv2"),
    }
    if has_skip:
        out["nin_shortcut"] = _conv(sd, p + ".nin_shortcut")
    return out


def _vae_attn(sd, p):
    return {
        "norm": _vae_gn(sd, p + ".norm"),
        "q": _conv(sd, p + ".q"),
        "k": _conv(sd, p + ".k"),
        "v": _conv(sd, p + ".v"),
        "proj_out": _conv(sd, p + ".proj_out"),
    }


def convert_vae(sd: Mapping[str, np.ndarray], model: AutoencoderKL,
                prefix: str = "first_stage_model.") -> dict:
    g = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)} \
        if prefix else dict(sd)
    enc: Dict[str, Any] = {"conv_in": _conv(g, "encoder.conv_in"),
                           "norm_out": _vae_gn(g, "encoder.norm_out"),
                           "conv_out": _conv(g, "encoder.conv_out"),
                           "mid_block_1": _vae_res(g, "encoder.mid.block_1", False),
                           "mid_attn_1": _vae_attn(g, "encoder.mid.attn_1"),
                           "mid_block_2": _vae_res(g, "encoder.mid.block_2", False)}
    ch = model.ch
    ds = 1
    for level, mult in enumerate(model.ch_mult):
        for i in range(model.num_res_blocks):
            c_out = model.ch * mult
            enc[f"down_{level}_block_{i}"] = _vae_res(
                g, f"encoder.down.{level}.block.{i}", has_skip=(c_out != ch))
            ch = c_out
            if ds in model.attn_at_ds:
                enc[f"down_{level}_attn_{i}"] = _vae_attn(
                    g, f"encoder.down.{level}.attn.{i}")
        if level != len(model.ch_mult) - 1:
            enc[f"down_{level}_ds"] = {
                "conv": _conv(g, f"encoder.down.{level}.downsample.conv")}
            ds *= 2

    dec: Dict[str, Any] = {"conv_in": _conv(g, "decoder.conv_in"),
                           "norm_out": _vae_gn(g, "decoder.norm_out"),
                           "conv_out": _conv(g, "decoder.conv_out"),
                           "mid_block_1": _vae_res(g, "decoder.mid.block_1", False),
                           "mid_attn_1": _vae_attn(g, "decoder.mid.attn_1"),
                           "mid_block_2": _vae_res(g, "decoder.mid.block_2", False)}
    ch = model.ch * model.ch_mult[-1]
    ds = 2 ** (len(model.ch_mult) - 1)
    for level, mult in list(enumerate(model.ch_mult))[::-1]:
        for i in range(model.num_res_blocks + 1):
            c_out = model.ch * mult
            dec[f"up_{level}_block_{i}"] = _vae_res(
                g, f"decoder.up.{level}.block.{i}", has_skip=(c_out != ch))
            ch = c_out
            if ds in model.attn_at_ds:
                dec[f"up_{level}_attn_{i}"] = _vae_attn(
                    g, f"decoder.up.{level}.attn.{i}")
        if level != 0:
            dec[f"up_{level}_us"] = {
                "conv": _conv(g, f"decoder.up.{level}.upsample.conv")}
            ds //= 2

    return {"params": {"encoder": enc, "decoder": dec,
                       "quant_conv": _conv(g, "quant_conv"),
                       "post_quant_conv": _conv(g, "post_quant_conv")}}


def convert_vq(sd: Mapping[str, np.ndarray], model,
               prefix: str = "first_stage_model.") -> dict:
    """LDM VQ first stage (VQModelInterface, autoencoder.py:264-282):
    the KL layout plus the ``quantize.embedding.weight`` codebook."""
    g = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)} \
        if prefix else dict(sd)
    params = convert_vae(g, model, prefix="")["params"]
    params["quantize"] = {"embedding": _np(g, "quantize.embedding.weight")}
    return {"params": params}


def save_sd_params_dir(path: str, unet_params, vae_params,
                       clip_params) -> None:
    """Write the three converted SD towers as an own-format directory
    (sd_unet/sd_vae/sd_clip.msgpack), loadable by load_sd_params_dir."""
    import os

    from ..utils.checkpoint import save_tree

    os.makedirs(path, exist_ok=True)
    for name, tree in (("sd_unet", unet_params), ("sd_vae", vae_params),
                       ("sd_clip", clip_params)):
        save_tree(os.path.join(path, f"{name}.msgpack"), tree)


def load_sd_params_dir(path: str, *, unet: SDUNetModel, vae,
                       clip, clip_config: CLIPTextConfig):
    """Load a save_sd_params_dir directory back into (unet_params,
    vae_params, clip_params) for the given model instances."""
    import os

    import jax.numpy as jnp

    from ..utils.checkpoint import load_tree_for_model

    ds = 8 * 2 ** (len(unet.channel_mult) - 1)   # full down/up roundtrip
    specs = (
        ("sd_unet", unet, (jnp.zeros((1, ds, ds, unet.in_channels)),
                           jnp.zeros((1,)),
                           jnp.zeros((1, 2, unet.context_dim)))),
        ("sd_vae", vae, (jnp.zeros((1, 2 ** len(vae.ch_mult) * 2,
                                    2 ** len(vae.ch_mult) * 2, 3)),)),
        ("sd_clip", clip, (jnp.zeros((1, clip_config.max_length),
                                     jnp.int32),)),
    )
    return tuple(
        load_tree_for_model(os.path.join(path, f"{name}.msgpack"), m, args)
        for name, m, args in specs)


def split_sd_checkpoint(sd: Mapping[str, np.ndarray], *,
                        unet: SDUNetModel, vae: AutoencoderKL,
                        clip_config: CLIPTextConfig):
    """Full CompVis checkpoint -> (unet_params, vae_params, clip_params)."""
    clip_sd = {k[len("cond_stage_model.transformer."):]: v
               for k, v in sd.items()
               if k.startswith("cond_stage_model.transformer.")}
    return (convert_sd_unet(sd, unet), convert_vae(sd, vae),
            convert_clip_text(clip_sd, clip_config))
