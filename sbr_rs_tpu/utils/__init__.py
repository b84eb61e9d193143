"""Utilities: checkpointing, metrics/logging, profiling."""

from . import checkpoint, metrics

__all__ = ["checkpoint", "metrics"]
