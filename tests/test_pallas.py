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
from sbr_rs_tpu.ops.pallas_table import gather_rows, scatter_add_rows


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


def test_table_gather_matches_take():
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(37, 33)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, 37, 700), jnp.int32)
    with pltpu.force_tpu_interpret_mode():
        got = gather_rows(table, idx)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(jnp.take(table, idx, axis=0)))


def test_table_gather_grad_is_scatter():
    rng = np.random.default_rng(1)
    table = jnp.asarray(rng.normal(size=(19, 8)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, 19, 100), jnp.int32)
    w = jnp.asarray(rng.normal(size=(100, 8)), jnp.float32)

    def loss_kernel(t):
        return jnp.sum(gather_rows(t, idx) * w)

    def loss_take(t):
        return jnp.sum(jnp.take(t, idx, axis=0) * w)

    want = jax.grad(loss_take)(table)
    with pltpu.force_tpu_interpret_mode():
        got = jax.grad(loss_kernel)(table)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_table_scatter_matches_at_add_with_drop():
    rng = np.random.default_rng(2)
    n = 23
    idx = np.concatenate([rng.integers(0, n, 400), np.full(57, n)])  # drops
    g = jnp.asarray(rng.normal(size=(len(idx), 12)), jnp.float32)
    idx_j = jnp.asarray(idx, jnp.int32)
    want = jnp.zeros((n, 12), jnp.float32).at[idx_j].add(g, mode="drop")
    with pltpu.force_tpu_interpret_mode():
        got = scatter_add_rows(g, idx_j, n)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
