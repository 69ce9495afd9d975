"""Pallas TPU kernels for the hot compute paths."""

from .conv_im2col import conv3x3, conv3x3_im2col, resolve_use_im2col
from .flash_attention import flash_attention, resolve_use_flash
from .fused_norm import (fused_group_norm, fused_norm_available,
                         group_norm_reference)

__all__ = ["flash_attention", "resolve_use_flash", "fused_group_norm", "fused_norm_available",
           "group_norm_reference", "conv3x3", "conv3x3_im2col", "resolve_use_im2col"]
