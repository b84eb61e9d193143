"""Pairwise ranking losses.

Exact formulas from the reference (``src/models/lstm.rs:313-320``,
``src/models/ewma.rs:328-335``):

* BPR:   ``sigmoid(neg - pos)`` — note this is the reference's literal
  formula (a sigmoid of the score difference), not the textbook
  ``-log sigmoid(pos - neg)``; we preserve it for parity.
* Hinge / WARP: ``relu(1 + neg - pos)``.

WARP differs from Hinge only in how the negative is chosen
(see :mod:`sbr_rs_tpu.ops.sampling`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models import Loss


def pairwise_loss(loss: Loss, positive_scores: jnp.ndarray, negative_scores: jnp.ndarray):
    """Elementwise pairwise loss for (positive, negative) score pairs."""
    if loss == Loss.BPR:
        return jax.nn.sigmoid(negative_scores - positive_scores)
    elif loss in (Loss.HINGE, Loss.WARP):
        return jax.nn.relu(1.0 + negative_scores - positive_scores)
    raise ValueError(f"Unknown loss: {loss}")
