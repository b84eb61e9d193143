"""Negative sampling: the WARP adaptive-selection rule.

Reference ``src/models/sequence_model.rs:47-68``: draw up to 5 uniform
negatives; accept the FIRST whose hinge margin is violated
(``1 - pos + neg > 0``); if none violates, keep the LAST draw (which then
contributes zero hinge loss — no gradient). The reference runs this as a
serial rejection loop with a dot product per draw; here all K candidate
scores are computed at once and the same rule is applied as a vectorized
argmax — identical selection distribution, parallel FLOPs.
"""

from __future__ import annotations

import jax.numpy as jnp

WARP_CANDIDATES = 5  # reference draws at most 5 (src/models/sequence_model.rs:58)


def warp_select(pos_scores: jnp.ndarray, cand_scores: jnp.ndarray) -> jnp.ndarray:
    """Index of the accepted candidate per position.

    ``pos_scores [...]``, ``cand_scores [..., K]`` → int32 ``[...]`` in
    ``[0, K)``: the first k with ``1 - pos + cand_k > 0``, else ``K - 1``.
    """
    k = cand_scores.shape[-1]
    viol = (1.0 - pos_scores[..., None] + cand_scores) > 0.0
    first = jnp.argmax(viol, axis=-1)
    return jnp.where(viol.any(axis=-1), first, k - 1).astype(jnp.int32)
