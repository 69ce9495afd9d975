"""Diffusion model families: ADM UNet (+classifier), SD latent stack."""

from .attention import CrossAttention, SpatialTransformer
from .clip_text import (CLIPTextConfig, CLIPTextEncoder, ClassEmbedder,
                        ClipBPETokenizer)
from .factory import (ClassifierConfig, ModelConfig, attention_ds,
                      create_classifier, create_model, create_sr_model,
                      create_tables, parse_channel_mult)
from .nn import GroupNorm32, timestep_embedding
from .sd_unet import SDUNetModel
from .unet import (AttentionBlock, EncoderUNetModel, ResBlock, SuperResModel,
                   UNetModel, unet_layer_count)
from .vae import (SD_SCALE_FACTOR, AutoencoderKL, Decoder, Encoder,
                  VectorQuantizer, VQModelInterface)

__all__ = [
    "ClassifierConfig", "ModelConfig", "attention_ds", "create_classifier",
    "create_model", "create_sr_model", "create_tables", "parse_channel_mult",
    "GroupNorm32",
    "timestep_embedding", "AttentionBlock", "EncoderUNetModel", "ResBlock",
    "SuperResModel", "UNetModel", "unet_layer_count", "CrossAttention",
    "SpatialTransformer", "CLIPTextConfig", "CLIPTextEncoder",
    "ClipBPETokenizer", "SDUNetModel", "AutoencoderKL", "Decoder", "Encoder",
    "VectorQuantizer", "VQModelInterface", "ClassEmbedder",
    "SD_SCALE_FACTOR",
]
