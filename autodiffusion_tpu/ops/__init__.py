"""Pallas TPU kernels for the hot compute paths."""

from .flash_attention import flash_attention, flash_attention_bthd

__all__ = ["flash_attention", "flash_attention_bthd"]
