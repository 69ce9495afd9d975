"""Diffusion model families: ADM UNet (+classifier), SD latent stack."""

from .factory import (ClassifierConfig, ModelConfig, attention_ds,
                      create_classifier, create_model, create_tables,
                      parse_channel_mult)
from .nn import GroupNorm32, timestep_embedding
from .unet import (AttentionBlock, EncoderUNetModel, ResBlock, SuperResModel,
                   UNetModel, unet_layer_count)

__all__ = [
    "ClassifierConfig", "ModelConfig", "attention_ds", "create_classifier",
    "create_model", "create_tables", "parse_channel_mult", "GroupNorm32",
    "timestep_embedding", "AttentionBlock", "EncoderUNetModel", "ResBlock",
    "SuperResModel", "UNetModel", "unet_layer_count",
]
