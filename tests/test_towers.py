"""Tower unit tests against closed-form recurrences — coverage the
reference lacks (SURVEY.md §4 implications)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sbr_rs_tpu.models import towers


def test_ewma_matches_naive_recurrence():
    """Associative-scan EWMA == the reference recurrence
    u_0 = x_0; u_t = a*u_{t-1} + (1-a)*x_t (`src/models/ewma.rs:302-313`)."""
    rng = np.random.default_rng(0)
    b, t, d = 3, 7, 5
    x = rng.normal(size=(b, t, d)).astype(np.float32)
    alpha = rng.normal(size=(d,)).astype(np.float32)
    params = {"alpha": jnp.asarray(alpha)}

    out = np.asarray(towers.ewma_apply(params, jnp.asarray(x)))

    a = 1.0 / (1.0 + np.exp(-alpha))
    expected = np.zeros_like(x)
    expected[:, 0] = x[:, 0]
    for i in range(1, t):
        expected[:, i] = a * expected[:, i - 1] + (1.0 - a) * x[:, i]
    np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-6)


def test_ewma_alpha_zero_init_gives_half_decay():
    params = towers.init_ewma(jax.random.PRNGKey(0), 4)
    x = jnp.ones((1, 2, 4))
    out = towers.ewma_apply(params, x)
    # a = 0.5: u_1 = 0.5*1 + 0.5*1 = 1
    np.testing.assert_allclose(np.asarray(out), 1.0, rtol=1e-6)


@pytest.mark.parametrize("coupled", [False, True])
def test_lstm_matches_stepwise_cell(coupled):
    """The scanned LSTM equals a hand-rolled per-step cell."""
    rng = np.random.default_rng(1)
    b, t, d = 2, 5, 4
    key = jax.random.PRNGKey(0)
    params = towers.init_lstm(key, d, coupled)
    # randomize the bias too so gates are non-trivial
    params = dict(params, b=jnp.asarray(rng.normal(size=(params["b"].shape)).astype(np.float32)))
    x = rng.normal(size=(b, t, d)).astype(np.float32)

    out = np.asarray(towers.lstm_apply(params, jnp.asarray(x), coupled=coupled))

    w_x = np.asarray(params["w_x"])
    w_h = np.asarray(params["w_h"])
    bias = np.asarray(params["b"])

    def sigmoid(v):
        return 1.0 / (1.0 + np.exp(-v))

    h = np.zeros((b, d), np.float32)
    c = np.zeros((b, d), np.float32)
    expected = np.zeros((b, t, d), np.float32)
    for step in range(t):
        z = x[:, step] @ w_x + h @ w_h + bias
        if coupled:
            i, g, o = np.split(z, 3, axis=-1)
            i = sigmoid(i)
            c = (1.0 - i) * c + i * np.tanh(g)
        else:
            i, f, g, o = np.split(z, 4, axis=-1)
            c = sigmoid(f) * c + sigmoid(i) * np.tanh(g)
        h = sigmoid(o) * np.tanh(c)
        expected[:, step] = h
    np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-5)


def test_gru_matches_stepwise_cell():
    """The scanned GRU equals a hand-rolled per-step cell
    (gates [r, z, n], h' = (1-z)*n + z*h)."""
    rng = np.random.default_rng(2)
    b, t, d = 2, 6, 4
    params = towers.init_gru(jax.random.PRNGKey(0), d)
    params = dict(params, b=jnp.asarray(rng.normal(size=params["b"].shape).astype(np.float32)))
    x = rng.normal(size=(b, t, d)).astype(np.float32)

    out = np.asarray(towers.gru_apply(params, jnp.asarray(x)))

    w_x = np.asarray(params["w_x"])
    w_h = np.asarray(params["w_h"])
    bias = np.asarray(params["b"])

    def sigmoid(v):
        return 1.0 / (1.0 + np.exp(-v))

    h = np.zeros((b, d), np.float32)
    expected = np.zeros((b, t, d), np.float32)
    for step in range(t):
        xz = x[:, step] @ w_x + bias
        hz = h @ w_h
        xr, xu, xn = np.split(xz, 3, axis=-1)
        hr, hu, hn = np.split(hz, 3, axis=-1)
        r = sigmoid(xr + hr)
        z = sigmoid(xu + hu)
        n = np.tanh(xn + r * hn)
        h = (1.0 - z) * n + z * h
        expected[:, step] = h
    np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-5)


def test_gru_packed_resets_match_separate():
    """A packed row with a window boundary equals the two windows run
    separately (the carry resets at starts, same contract as the LSTM)."""
    rng = np.random.default_rng(3)
    d = 4
    params = towers.init_gru(jax.random.PRNGKey(1), d)
    a = rng.normal(size=(1, 3, d)).astype(np.float32)
    b = rng.normal(size=(1, 2, d)).astype(np.float32)
    packed = np.concatenate([a, b], axis=1)
    starts = np.zeros((1, 5), np.float32)
    starts[0, 3] = 1.0
    out = np.asarray(
        towers.gru_apply(params, jnp.asarray(packed), starts=jnp.asarray(starts))
    )
    want_a = np.asarray(towers.gru_apply(params, jnp.asarray(a)))
    want_b = np.asarray(towers.gru_apply(params, jnp.asarray(b)))
    np.testing.assert_allclose(out[:, :3], want_a, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(out[:, 3:], want_b, rtol=1e-5, atol=1e-6)


def test_lstm_param_shapes():
    p_normal = towers.init_lstm(jax.random.PRNGKey(0), 8, coupled=False)
    p_coupled = towers.init_lstm(jax.random.PRNGKey(0), 8, coupled=True)
    assert p_normal["w_x"].shape == (8, 32)
    assert p_coupled["w_x"].shape == (8, 24)
    assert p_normal["b"].shape == (32,)


def test_towers_differentiable():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 4, 4))
    for params, fn in [
        (towers.init_ewma(key, 4), towers.ewma_apply),
        (towers.init_lstm(key, 4, True), lambda p, x: towers.lstm_apply(p, x, coupled=True)),
        (towers.init_gru(key, 4), towers.gru_apply),
    ]:
        grads = jax.grad(lambda p: jnp.sum(fn(p, x)))(params)
        for leaf in jax.tree_util.tree_leaves(grads):
            assert np.all(np.isfinite(np.asarray(leaf)))
