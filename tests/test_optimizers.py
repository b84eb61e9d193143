"""Sparse optimizer tests: the scatter-based sparse path must equal a dense
reference implementation restricted to touched rows (wyrm's sparse-row
semantics, SURVEY.md §2.3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sbr_rs_tpu.models import Optimizer
from sbr_rs_tpu.ops import optimizers as O


def _dense_reference(kind, lr, l2, table, state, row_grads_by_row, step):
    """Reference: apply the optimizer rule to exactly the touched rows."""
    table = np.array(table, dtype=np.float64)
    state = {k: np.array(v, dtype=np.float64) for k, v in state.items()}
    for row, g in row_grads_by_row.items():
        g = np.asarray(g, dtype=np.float64) + l2 * table[row]
        if kind == Optimizer.ADAGRAD:
            state["acc"][row] += g * g
            table[row] -= lr * g / np.sqrt(state["acc"][row] + 1e-10)
        else:
            state["m"][row] = 0.9 * state["m"][row] + 0.1 * g
            state["v"][row] = 0.999 * state["v"][row] + 0.001 * g * g
            t = step + 1.0
            m_hat = state["m"][row] / (1 - 0.9**t)
            v_hat = state["v"][row] / (1 - 0.999**t)
            table[row] -= lr * m_hat / (np.sqrt(v_hat) + 1e-8)
    return table, state


@pytest.mark.parametrize("kind", [Optimizer.ADAGRAD, Optimizer.ADAM])
@pytest.mark.parametrize("ndim", [1, 2])
def test_sparse_update_matches_dense_on_touched_rows(kind, ndim):
    rng = np.random.default_rng(0)
    num_rows, d = 11, 3
    shape = (num_rows,) if ndim == 1 else (num_rows, d)
    table = rng.normal(size=shape).astype(np.float32)
    state = {k: np.abs(rng.normal(size=shape)).astype(np.float32)
             for k in (["acc"] if kind == Optimizer.ADAGRAD else ["m", "v"])}

    # occurrences with duplicates + invalid entries
    idx = np.array([3, 7, 3, 0, 7, 5, 9], dtype=np.int32)
    valid = np.array([1, 1, 1, 1, 1, 0, 0], dtype=bool)
    g_shape = (len(idx),) if ndim == 1 else (len(idx), d)
    grads = rng.normal(size=g_shape).astype(np.float32)

    dd = O.dedupe_rows(jnp.asarray(idx), jnp.asarray(valid), num_rows)
    summed = O.segment_sum_grads(jnp.asarray(grads), dd)
    new_table, new_state = O.sparse_update(
        kind, 0.1, 0.01,
        jnp.asarray(table), {k: jnp.asarray(v) for k, v in state.items()},
        dd, summed, jnp.asarray(0, jnp.int32),
    )

    # reference: per-unique-row summed grads (invalid occurrences excluded)
    by_row = {}
    for i, (r, v) in enumerate(zip(idx, valid)):
        if v:
            by_row.setdefault(int(r), np.zeros(grads.shape[1:] or (1,)))
            by_row[int(r)] = by_row[int(r)] + grads[i]
    if ndim == 1:
        by_row = {r: g.reshape(()) for r, g in by_row.items()}
    exp_table, exp_state = _dense_reference(kind, 0.1, 0.01, table, state, by_row, 0.0)

    np.testing.assert_allclose(np.asarray(new_table), exp_table, rtol=1e-4, atol=1e-6)
    for k in state:
        np.testing.assert_allclose(np.asarray(new_state[k]), exp_state[k], rtol=1e-4, atol=1e-6)

    # untouched rows unchanged
    untouched = [r for r in range(num_rows) if r not in by_row]
    np.testing.assert_array_equal(np.asarray(new_table)[untouched], table[untouched])


def test_dedupe_rows_basic():
    idx = jnp.asarray(np.array([5, 2, 5, 2, 8], dtype=np.int32))
    valid = jnp.asarray(np.array([1, 1, 1, 1, 0], dtype=bool))
    dd = O.dedupe_rows(idx, valid, 10)
    rows = np.asarray(dd.row_ids)
    v = np.asarray(dd.valid)
    real = sorted(rows[v].tolist())
    assert real == [2, 5]
    # invalid occurrence's segment dropped
    assert np.all(rows[~v] == 10)


def test_dedupe_and_sum_matches_float64_segment_sums():
    """dedupe_and_sum's cumsum-difference run sums must stay TIGHTLY close
    (~1e-6) to exact float64 per-row segment sums — the golden engine test's
    loose end-to-end tolerance (1e-3) does not bound association error on
    its own (ADVICE r2). Large occurrence counts with duplicates exercise
    the blocked-cumsum prefix rounding this is about."""
    rng = np.random.default_rng(7)
    num_rows = 50
    m = 1000  # several cumsum blocks
    idx = rng.integers(0, num_rows, m).astype(np.int32)
    valid = rng.random(m) < 0.9
    grads = rng.normal(size=(m, 5)).astype(np.float32)
    bias_occ = rng.random(m) < 0.5

    dd, summed, bias_valid = O.dedupe_and_sum(
        jnp.asarray(idx), jnp.asarray(valid), jnp.asarray(grads),
        jnp.asarray(bias_occ), num_rows,
    )
    rows = np.asarray(dd.row_ids)
    live = np.asarray(dd.valid)
    summed = np.asarray(summed)
    bias_valid_np = np.asarray(bias_valid)

    # exact float64 reference per row
    exp = {}
    exp_bias = {}
    for i in range(m):
        if valid[i]:
            r = int(idx[i])
            exp[r] = exp.get(r, np.zeros(5, np.float64)) + grads[i].astype(np.float64)
            exp_bias[r] = exp_bias.get(r, False) or bool(bias_occ[i])

    got_rows = sorted(rows[live].tolist())
    assert got_rows == sorted(exp.keys())
    for p in np.flatnonzero(live):
        r = int(rows[p])
        np.testing.assert_allclose(summed[p], exp[r], atol=2e-6, rtol=1e-5)
        assert bool(bias_valid_np[p]) == exp_bias[r]


def test_dense_update_adagrad_first_step_magnitude():
    """With zero accumulator, the first Adagrad step is ~lr per coordinate."""
    p = jnp.asarray(np.zeros(4, np.float32))
    st = O.init_state(Optimizer.ADAGRAD, p)
    g = jnp.asarray(np.array([1.0, -2.0, 0.5, 4.0], np.float32))
    new_p, _ = O.dense_update(Optimizer.ADAGRAD, 0.1, 0.0, p, st, g, jnp.asarray(0))
    np.testing.assert_allclose(np.abs(np.asarray(new_p)), 0.1, rtol=1e-3)


def test_lr_schedule_scales_updates():
    """linear/cosine schedules: step 0 equals the constant-lr step, later
    steps shrink (linear halves lr at the midpoint of total_steps=2)."""
    import jax
    import jax.numpy as jnp

    from sbr_rs_tpu.models import Loss, Optimizer
    from sbr_rs_tpu.models.engine import (
        EngineConfig,
        init_embedding_params,
        init_opt_state,
        make_train_step,
    )

    n, d, b, t = 12, 4, 2, 3
    params = init_embedding_params(jax.random.PRNGKey(0), n, d)
    params["tower"] = {}
    rng = np.random.default_rng(0)
    batch = {
        "stream": jnp.asarray(rng.integers(0, n, (b, t + 1)), jnp.int32),
        "mask": jnp.ones((b, t), jnp.float32),
    }
    key = jax.random.PRNGKey(3)

    def two_steps(schedule):
        cfg = EngineConfig(
            num_items=n, loss=Loss.HINGE, optimizer=Optimizer.ADAGRAD,
            learning_rate=0.5, l2_penalty=0.0, sparse_updates=False,
            lr_schedule=schedule,
        )
        step = make_train_step(cfg, lambda p, x, starts=None: x, total_steps=2)
        p, s = params, init_opt_state(Optimizer.ADAGRAD, params)
        tables = []
        for _ in range(2):
            p, s, _ = step(p, s, key, batch)
            tables.append(np.asarray(p["item_table"]))
        return tables

    const = two_steps("constant")
    linear = two_steps("linear")
    t0 = np.asarray(params["item_table"])
    # step 0: full lr either way
    np.testing.assert_allclose(const[0], linear[0], atol=1e-7)
    # step 1: linear runs at lr/2 — strictly smaller movement
    d_const = np.abs(const[1] - const[0]).sum()
    d_linear = np.abs(linear[1] - linear[0]).sum()
    assert 0 < d_linear < d_const
    assert np.abs(const[0] - t0).sum() > 0  # something actually moved
