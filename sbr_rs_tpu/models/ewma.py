"""Model based on an exponentially-weighted average (EWMA) of past embeddings.

Reference: ``src/models/ewma.rs`` — the user state is
``u_1 = i_1``, ``u_t = sigmoid(alpha) * u_{t-1} + (1 - sigmoid(alpha)) * i_t``
with a learnable per-dimension decay ``alpha`` (``src/models/ewma.rs:302-313``;
the docstring formula at ``ewma.rs:11`` has a ``+``-for-``*`` typo).

The reference's dead ``fc1``/``fc2`` parameters and the ``Clone`` bug that
copies ``alpha`` into them (``src/models/ewma.rs:179-188,225-226``) are
deliberately not reproduced (SURVEY.md §2.1).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from . import base
from .towers import ewma_apply, init_ewma


class Hyperparameters(base.Hyperparameters):
    """Hyperparameters for the :class:`ImplicitEWMAModel`
    (reference ``src/models/ewma.rs:44-165``)."""

    def __init__(self, num_items: int, max_sequence_length: int):
        super().__init__(num_items, max_sequence_length)
        self._alpha_init = 0.0

    def alpha_init(self, value: float) -> "Hyperparameters":
        """Initial per-dimension decay logit (default 0.0 = the reference's
        zero init, sigmoid(0) = 0.5 decay — ``src/models/ewma.rs:175-178``).
        A tuning lever; 0.0 reproduces the reference bit-for-bit."""
        self._alpha_init = float(value)
        return self

    @classmethod
    def random(cls, num_items: int, rng: "np.random.Generator | int | None" = None) -> "Hyperparameters":
        """Random hyperparameters for search (reference ``src/models/ewma.rs:139-165``)."""
        rng = rng if isinstance(rng, np.random.Generator) else np.random.default_rng(rng)
        return cls._random_common(num_items, rng)

    def to_dict(self) -> dict:
        d = super().to_dict()
        d["model_type"] = "ewma"
        d["alpha_init"] = self._alpha_init
        return d

    @classmethod
    def from_dict(cls, d: dict) -> "Hyperparameters":
        hp = cls._from_dict_common(d)
        hp._alpha_init = d.get("alpha_init", 0.0)
        return hp

    def build(self) -> "ImplicitEWMAModel":
        """Build the implicit EWMA model (reference ``src/models/ewma.rs:200-206``)."""
        return ImplicitEWMAModel(self)


class ImplicitEWMAModel(base.ImplicitSequenceModel):
    """EWMA sequence model for implicit feedback
    (reference ``src/models/ewma.rs:399-436``)."""

    def _init_tower(self, key: jax.Array, dim: int) -> Dict:
        return init_ewma(key, dim, alpha_init=getattr(self.hyper, "_alpha_init", 0.0))

    def _tower_fn(self):
        return ewma_apply
