"""Pallas TPU kernels for the hot compute paths."""

from .flash_attention import flash_attention

__all__ = ["flash_attention"]
