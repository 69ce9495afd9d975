"""PyTorch checkpoint -> flax params conversion for the ADM model family.

The reference ships/loads torch ``.pt`` state dicts
(guided_diffusion/dist_util.py:56-63; unet.py module tree). This module maps
them onto the NHWC flax modules in models/unet.py by walking the UNet
construction order in lockstep. Layout changes:

  conv2d   [out,in,kh,kw] -> [kh,kw,in,out]
  conv1d   [out,in,1]     -> dense [in,out]
  linear   [out,in]       -> [in,out]
  groupnorm weight/bias   -> scale/bias
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

from .unet import EncoderUNetModel, UNetModel

__all__ = ["convert_unet", "convert_classifier", "load_torch_state_dict"]


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint into numpy (host, float32)."""
    import torch

    sd = torch.load(path, map_location="cpu")
    if isinstance(sd, dict) and "state_dict" in sd:   # lightning-style
        sd = sd["state_dict"]
    return {k: v.float().numpy() for k, v in sd.items() if hasattr(v, "numpy")}


def _np(sd: Mapping[str, np.ndarray], key: str) -> np.ndarray:
    v = sd[key]
    return v if isinstance(v, np.ndarray) else v.detach().cpu().float().numpy()


def _conv(sd, p):
    out = {"kernel": _np(sd, p + ".weight").transpose(2, 3, 1, 0)}
    if p + ".bias" in sd:
        out["bias"] = _np(sd, p + ".bias")
    return out


def _dense_from_conv1d(sd, p):
    w = _np(sd, p + ".weight")  # [out, in, 1]
    return {"kernel": w[..., 0].T, "bias": _np(sd, p + ".bias")}


def _dense(sd, p, bias=True):
    out = {"kernel": _np(sd, p + ".weight").T}
    if bias:
        out["bias"] = _np(sd, p + ".bias")
    return out


def _gn(sd, p):
    return {"GroupNorm_0": {"scale": _np(sd, p + ".weight"), "bias": _np(sd, p + ".bias")}}


def _resblock(sd, p, has_skip: bool):
    out = {
        "in_norm": _gn(sd, p + ".in_layers.0"),
        "in_conv": _conv(sd, p + ".in_layers.2"),
        "emb_proj": _dense(sd, p + ".emb_layers.1"),
        "out_norm": _gn(sd, p + ".out_layers.0"),
        "out_conv": _conv(sd, p + ".out_layers.3"),
    }
    if has_skip:
        out["skip"] = _conv(sd, p + ".skip_connection")
    return out


def _attnblock(sd, p):
    return {
        "norm": _gn(sd, p + ".norm"),
        "qkv": _dense_from_conv1d(sd, p + ".qkv"),
        "proj_out": _dense_from_conv1d(sd, p + ".proj_out"),
    }


def _encoder_walk(sd, model, params: dict) -> tuple:
    """Shared input_blocks/middle_block walk: the reference UNetModel and
    EncoderUNetModel build their encoders with identical module layouts
    (unet.py input/middle sections), so one walk serves both converters —
    a fix to the skip/downsample mapping must not have to be applied
    twice. Returns (ch, ds) where the walk left off for the decoder."""
    mc = model.model_channels
    ch = int(model.channel_mult[0] * mc)
    idx = 1
    ds = 1
    for level, mult in enumerate(model.channel_mult):
        for i in range(model.num_res_blocks):
            c_out = int(mult * mc)
            params[f"down_{level}_{i}_res"] = _resblock(
                sd, f"input_blocks.{idx}.0", has_skip=(c_out != ch))
            ch = c_out
            if ds in model.attention_ds:
                params[f"down_{level}_{i}_attn"] = _attnblock(sd, f"input_blocks.{idx}.1")
            idx += 1
        if level != len(model.channel_mult) - 1:
            if model.resblock_updown:
                params[f"down_{level}_ds"] = _resblock(
                    sd, f"input_blocks.{idx}.0", has_skip=False)
            else:
                params[f"down_{level}_ds"] = {"op": _conv(sd, f"input_blocks.{idx}.0.op")}
            idx += 1
            ds *= 2

    params["mid_res0"] = _resblock(sd, "middle_block.0", has_skip=False)
    params["mid_attn"] = _attnblock(sd, "middle_block.1")
    params["mid_res1"] = _resblock(sd, "middle_block.2", has_skip=False)
    return ch, ds


def convert_unet(sd: Mapping[str, np.ndarray], model: UNetModel) -> dict:
    """Map a guided-diffusion UNetModel/Dynamic_UNetModel state dict onto the
    flax param tree of models.unet.UNetModel (unet.py:396-665 walk order)."""
    mc = model.model_channels
    params: dict = {
        "time_embed_0": _dense(sd, "time_embed.0"),
        "time_embed_2": _dense(sd, "time_embed.2"),
        "in_conv": _conv(sd, "input_blocks.0.0"),
    }
    if model.num_classes is not None:
        params["label_emb"] = {"embedding": _np(sd, "label_emb.weight")}

    ch, ds = _encoder_walk(sd, model, params)

    # mirror the encoder's per-block channel bookkeeping for skip concat widths
    input_chans = [int(model.channel_mult[0] * mc)]
    c = input_chans[0]
    for level, mult in enumerate(model.channel_mult):
        for _ in range(model.num_res_blocks):
            c = int(mult * mc)
            input_chans.append(c)
        if level != len(model.channel_mult) - 1:
            input_chans.append(c)

    j = 0
    for level, mult in list(enumerate(model.channel_mult))[::-1]:
        for i in range(model.num_res_blocks + 1):
            ich = input_chans.pop()
            c_out = int(mult * mc)
            params[f"up_{level}_{i}_res"] = _resblock(
                sd, f"output_blocks.{j}.0", has_skip=(c_out != ch + ich))
            ch = c_out
            sub = 1
            if ds in model.attention_ds:
                params[f"up_{level}_{i}_attn"] = _attnblock(sd, f"output_blocks.{j}.{sub}")
                sub += 1
            if level and i == model.num_res_blocks:
                if model.resblock_updown:
                    params[f"up_{level}_us"] = _resblock(
                        sd, f"output_blocks.{j}.{sub}", has_skip=False)
                else:
                    params[f"up_{level}_us"] = {
                        "conv": _conv(sd, f"output_blocks.{j}.{sub}.conv")}
                ds //= 2
            j += 1

    params["out_norm"] = _gn(sd, "out.0")
    params["out_conv"] = _conv(sd, "out.2")
    return {"params": params}


def convert_classifier(sd: Mapping[str, np.ndarray], model: EncoderUNetModel) -> dict:
    """Map an EncoderUNetModel (classifier) state dict (unet.py:685-896)."""
    params: dict = {
        "time_embed_0": _dense(sd, "time_embed.0"),
        "time_embed_2": _dense(sd, "time_embed.2"),
        "in_conv": _conv(sd, "input_blocks.0.0"),
    }
    _encoder_walk(sd, model, params)

    if model.pool == "attention":
        params["out_norm"] = _gn(sd, "out.0")
        params["out_pool"] = {
            # torch stores [C, T+1]; flax uses [T+1, C]
            "positional_embedding": _np(sd, "out.2.positional_embedding").T,
            "qkv_proj": _dense_from_conv1d(sd, "out.2.qkv_proj"),
            "c_proj": _dense_from_conv1d(sd, "out.2.c_proj"),
        }
    elif model.pool == "adaptive":
        params["out_norm"] = _gn(sd, "out.0")
        params["out_conv"] = _conv(sd, "out.3")
    elif model.pool == "spatial":
        # Sequential(Linear(feat, 2048), ReLU, Linear(2048, out)) (unet.py:843-848)
        params["out_fc0"] = _dense(sd, "out.0")
        params["out_fc1"] = _dense(sd, "out.2")
    elif model.pool == "spatial_v2":
        # Sequential(Linear, GroupNorm32(2048), SiLU, Linear) (unet.py:849-855)
        params["out_fc0"] = _dense(sd, "out.0")
        params["out_norm"] = _gn(sd, "out.1")
        params["out_fc1"] = _dense(sd, "out.3")
    else:
        raise NotImplementedError(model.pool)
    return {"params": params}
