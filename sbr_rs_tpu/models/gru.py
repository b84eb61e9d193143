"""GRU-based implicit-feedback sequence model (GRU4Rec-style).

A FOURTH model family with no reference counterpart (``src/models``
ships LSTM and EWMA; this repo adds attention and GRU): the GRU cell of
GRU4Rec — the classic session-based recommender — on the identical
engine / losses / optimizers / evaluation / serving / checkpoint
machinery. Next-item semantics, scoring, and chunking follow the
reference contract exactly (SURVEY.md §7); only the tower recurrence
differs (:func:`sbr_rs_tpu.models.towers.gru_apply`).

The ``lax.scan`` tower serves both training and serving on every backend;
the fused-Pallas treatment the LSTM received (``ops/pallas_lstm.py``)
applies structurally if the GRU recurrence ever becomes the measured
bottleneck — at the headline shapes the step is row-traffic bound, not
recurrence bound (ARCHITECTURE.md "Row-traffic roofline").
"""

from __future__ import annotations

from typing import Dict

import jax
import numpy as np

from . import base
from .towers import gru_apply, init_gru


class Hyperparameters(base.Hyperparameters):
    """Hyperparameters for the :class:`ImplicitGRUModel` (same knob set as
    the LSTM family, reference ``src/models/lstm.rs:38-172``, minus the
    cell-variant enum)."""

    @classmethod
    def random(cls, num_items: int, rng: "np.random.Generator | int | None" = None) -> "Hyperparameters":
        """Random hyperparameters for search (the reference's ranges,
        ``src/models/lstm.rs:141-172``)."""
        rng = rng if isinstance(rng, np.random.Generator) else np.random.default_rng(rng)
        return cls._random_common(num_items, rng)

    def to_dict(self) -> dict:
        d = super().to_dict()
        d["model_type"] = "gru"
        return d

    @classmethod
    def from_dict(cls, d: dict) -> "Hyperparameters":
        return cls._from_dict_common(d)

    def build(self) -> "ImplicitGRUModel":
        return ImplicitGRUModel(self)


class ImplicitGRUModel(base.ImplicitSequenceModel):
    """GRU sequence model for implicit feedback."""

    def _init_tower(self, key: jax.Array, dim: int) -> Dict:
        return init_gru(key, dim)

    def _tower_fn(self):
        return gru_apply
