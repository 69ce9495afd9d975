"""Utilities: logging, configuration."""

from . import logger

__all__ = ["logger"]
