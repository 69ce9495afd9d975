"""Model/diffusion factories and canonical flag bundles.

Equivalent of guided_diffusion/script_util.py:12-453: defaults dicts, the
per-resolution channel-mult table, attention-resolution parsing, and
constructors for the UNet, the noisy classifier, and schedule tables.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp

from ..schedules import build_base_tables, build_tables, space_timesteps
from .unet import EncoderUNetModel, UNetModel

NUM_CLASSES = 1000

# script_util.py:152-166
_CHANNEL_MULT = {
    512: (0.5, 1, 1, 2, 2, 4, 4),
    256: (1, 1, 2, 2, 4, 4),
    128: (1, 1, 2, 3, 4),
    64: (1, 2, 3, 4),
    32: (1, 2, 2, 2),
}


def parse_channel_mult(image_size: int, channel_mult: str = "") -> Tuple[float, ...]:
    if channel_mult:
        return tuple(float(m) if "." in m else int(m) for m in channel_mult.split(","))
    try:
        return _CHANNEL_MULT[image_size]
    except KeyError:
        raise ValueError(f"unsupported image size: {image_size}")


def attention_ds(image_size: int, attention_resolutions: str) -> Tuple[int, ...]:
    """"32,16,8" -> downsample ratios (image_size // res), script_util.py:176-178."""
    out = []
    for res in str(attention_resolutions).split(","):
        if res:
            out.append(image_size // int(res))
    return tuple(out)


@dataclasses.dataclass
class ModelConfig:
    """The flag bundle of model_and_diffusion_defaults (script_util.py:43-72)."""

    image_size: int = 64
    num_channels: int = 128
    num_res_blocks: int = 2
    num_heads: int = 4
    num_heads_upsample: int = -1
    num_head_channels: int = -1
    attention_resolutions: str = "16,8"
    channel_mult: str = ""
    dropout: float = 0.0
    class_cond: bool = False
    use_scale_shift_norm: bool = True
    resblock_updown: bool = False
    use_new_attention_order: bool = False
    learn_sigma: bool = False
    use_checkpoint: bool = False   # gradient remat (reference flag name)
    use_bf16: bool = False   # TPU analog of use_fp16
    # diffusion side
    diffusion_steps: int = 1000
    noise_schedule: str = "linear"
    timestep_respacing: str = ""
    use_kl: bool = False
    predict_xstart: bool = False
    rescale_timesteps: bool = False
    rescale_learned_sigmas: bool = False

    @classmethod
    def adm64(cls, **overrides) -> "ModelConfig":
        """The published ADM ImageNet-64 config
        (search_imagenet64_classifier_guidance.sh:1)."""
        base = dict(image_size=64, num_channels=192, num_res_blocks=3,
                    num_head_channels=64, attention_resolutions="32,16,8",
                    class_cond=True, learn_sigma=True, noise_schedule="cosine",
                    resblock_updown=True, use_new_attention_order=True,
                    use_scale_shift_norm=True, dropout=0.1, use_bf16=True)
        base.update(overrides)
        return cls(**base)

    @classmethod
    def lsun256(cls, **overrides) -> "ModelConfig":
        """LSUN bedroom/cat 256 uncond config (search_lsun_bedroom.sh)."""
        base = dict(image_size=256, num_channels=256, num_res_blocks=2,
                    num_head_channels=64, attention_resolutions="32,16,8",
                    class_cond=False, learn_sigma=True, noise_schedule="linear",
                    resblock_updown=True, use_scale_shift_norm=True,
                    use_bf16=True, dropout=0.1)
        base.update(overrides)
        return cls(**base)


def create_model(cfg: ModelConfig) -> UNetModel:
    return UNetModel(
        model_channels=cfg.num_channels,
        out_channels=6 if cfg.learn_sigma else 3,
        num_res_blocks=cfg.num_res_blocks,
        attention_ds=attention_ds(cfg.image_size, cfg.attention_resolutions),
        channel_mult=parse_channel_mult(cfg.image_size, cfg.channel_mult),
        dropout=cfg.dropout,
        num_classes=NUM_CLASSES if cfg.class_cond else None,
        num_heads=cfg.num_heads,
        num_head_channels=cfg.num_head_channels,
        num_heads_upsample=cfg.num_heads_upsample,
        use_scale_shift_norm=cfg.use_scale_shift_norm,
        resblock_updown=cfg.resblock_updown,
        use_new_attention_order=cfg.use_new_attention_order,
        use_remat=cfg.use_checkpoint,
        dtype=jnp.bfloat16 if cfg.use_bf16 else jnp.float32,
    )


@dataclasses.dataclass
class ClassifierConfig:
    """classifier_defaults (script_util.py:27-40)."""

    image_size: int = 64
    classifier_width: int = 128
    classifier_depth: int = 2
    classifier_attention_resolutions: str = "32,16,8"
    classifier_use_scale_shift_norm: bool = True
    classifier_resblock_updown: bool = True
    classifier_pool: str = "attention"
    classifier_use_bf16: bool = False

    @classmethod
    def adm64(cls, **overrides) -> "ClassifierConfig":
        base = dict(image_size=64, classifier_width=128, classifier_depth=4,
                    classifier_use_bf16=True)
        base.update(overrides)
        return cls(**base)


def create_sr_model(cfg: ModelConfig, large_size: int = 256,
                    small_size: int = 64):
    """Super-resolution UNet (sr_model_and_diffusion_defaults +
    sr_create_model_and_diffusion, script_util.py:298-414): a UNet at
    large_size whose input concatenates the upsampled low-res conditioning
    (in_channels 6 via SuperResModel)."""
    from .unet import SuperResModel

    unet = UNetModel(
        model_channels=cfg.num_channels,
        out_channels=6 if cfg.learn_sigma else 3,
        num_res_blocks=cfg.num_res_blocks,
        attention_ds=attention_ds(large_size, cfg.attention_resolutions),
        channel_mult=parse_channel_mult(large_size, cfg.channel_mult),
        dropout=cfg.dropout,
        num_classes=NUM_CLASSES if cfg.class_cond else None,
        num_heads=cfg.num_heads,
        num_head_channels=cfg.num_head_channels,
        use_scale_shift_norm=cfg.use_scale_shift_norm,
        resblock_updown=cfg.resblock_updown,
        use_new_attention_order=cfg.use_new_attention_order,
        dtype=jnp.bfloat16 if cfg.use_bf16 else jnp.float32,
    )
    return SuperResModel(unet=unet)


def create_classifier(cfg: ClassifierConfig,
                      num_classes: int = None) -> EncoderUNetModel:
    return EncoderUNetModel(
        model_channels=cfg.classifier_width,
        out_channels=num_classes or NUM_CLASSES,
        num_res_blocks=cfg.classifier_depth,
        attention_ds=attention_ds(cfg.image_size, cfg.classifier_attention_resolutions),
        channel_mult=parse_channel_mult(cfg.image_size),
        num_head_channels=64,
        use_scale_shift_norm=cfg.classifier_use_scale_shift_norm,
        resblock_updown=cfg.classifier_resblock_updown,
        use_new_attention_order=False,
        pool=cfg.classifier_pool,
        dtype=jnp.bfloat16 if cfg.classifier_use_bf16 else jnp.float32,
    )


def create_tables(cfg: ModelConfig, use_timesteps=None):
    """Schedule tables for a config; ``use_timesteps`` (candidate list or
    "ddimN" string) overrides cfg.timestep_respacing."""
    spec = use_timesteps if use_timesteps is not None else (
        cfg.timestep_respacing or None)
    if spec is None:
        return build_base_tables(cfg.noise_schedule, cfg.diffusion_steps)
    return build_tables(spec, base_schedule=cfg.noise_schedule,
                        base_num_steps=cfg.diffusion_steps)
