"""Utilities: logging, checkpointing, configuration."""

from . import checkpoint, logger

__all__ = ["logger", "checkpoint"]
