"""Utilities: checkpointing, logging."""
