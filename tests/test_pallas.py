"""Pallas kernel equivalence tests (interpret mode on CPU).

Every kernel must match its XLA-fallback implementation exactly
(SURVEY.md §7 stage 6: "each kernel ships with an XLA-fallback path and an
equivalence test").
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from sbr_rs_tpu.models.towers import init_lstm, lstm_apply
from sbr_rs_tpu.ops.pallas_lstm import lstm_apply_pallas



@pytest.mark.parametrize("coupled", [False, True])
@pytest.mark.parametrize("shape", [(4, 5, 32), (24, 17, 32), (9, 3, 16)])
def test_lstm_pallas_forward_matches_scan(coupled, shape):
    params = init_lstm(jax.random.PRNGKey(0), shape[2], coupled)
    x = jax.random.normal(jax.random.PRNGKey(1), shape)
    want = lstm_apply(params, x, coupled=coupled)
    with pltpu.force_tpu_interpret_mode():
        got = lstm_apply_pallas(params, x, coupled=coupled)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


@pytest.mark.parametrize("coupled", [False, True])
def test_lstm_pallas_grad_matches_scan(coupled):
    d = 16
    params = init_lstm(jax.random.PRNGKey(0), d, coupled)
    x = jax.random.normal(jax.random.PRNGKey(1), (6, 7, d))

    def loss_scan(p, xx):
        return jnp.sum(lstm_apply(p, xx, coupled=coupled) ** 2)

    def loss_pallas(p, xx):
        return jnp.sum(lstm_apply_pallas(p, xx, coupled=coupled) ** 2)

    want = jax.grad(loss_scan, argnums=(0, 1))(params, x)
    with pltpu.force_tpu_interpret_mode():
        got = jax.grad(loss_pallas, argnums=(0, 1))(params, x)
    for g, w in zip(jax.tree_util.tree_leaves(got), jax.tree_util.tree_leaves(want)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=1e-5)

