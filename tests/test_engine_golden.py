"""Golden test: one engine train step vs a pure-numpy reference.

Pins the exact step semantics end-to-end (identity tower so the recurrence
drops out): fused-table gather, WARP selection, hinge loss with masking,
touched-rows-only Adagrad with L2 — against a direct numpy transcription of
the reference's formulas (losses ``src/models/lstm.rs:313-320``, WARP rule
``src/models/sequence_model.rs:58-65``, per-row Adagrad semantics).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sbr_rs_tpu.models import Loss, Optimizer
from sbr_rs_tpu.models.engine import (
    EngineConfig,
    init_embedding_params,
    init_opt_state,
    make_train_step,
)

ADAGRAD_EPS = 1e-10


def _identity_tower(tower_params, x, starts=None):
    return x


def _numpy_reference_step(table, inputs, targets, mask, candidates, loss, lr, l2):
    """Per-sequence reference semantics, transcribed directly."""
    n, c = table.shape
    d = c - 1
    b, t = inputs.shape
    emb = table[:, :d]
    bias = table[:, d]

    grads = np.zeros_like(table)
    touched = np.zeros(n, dtype=bool)
    # The reference stores biases separately; input occurrences index only
    # the embedding table, so a row touched only as an input gets no L2 or
    # Adagrad update on its bias.
    bias_touched = np.zeros(n, dtype=bool)
    loss_sum = 0.0

    for i in range(b):
        for j in range(t):
            if mask[i, j] == 0:
                continue
            u = emb[inputs[i, j]]  # identity tower: hidden = input embedding
            pos = targets[i, j]
            s_pos = u @ emb[pos] + bias[pos]

            if loss == Loss.WARP:
                neg = candidates[i, j, -1]
                for k in range(candidates.shape[2]):
                    cand = candidates[i, j, k]
                    s_c = u @ emb[cand] + bias[cand]
                    if 1.0 - s_pos + s_c > 0.0:
                        neg = cand
                        break
            else:
                neg = candidates[i, j, 0]
            s_neg = u @ emb[neg] + bias[neg]

            if loss == Loss.BPR:
                sig = 1.0 / (1.0 + np.exp(-(s_neg - s_pos)))
                loss_sum += sig
                dpos, dneg = -sig * (1 - sig), sig * (1 - sig)
            else:
                margin = 1.0 + s_neg - s_pos
                loss_sum += max(margin, 0.0)
                active = 1.0 if margin > 0 else 0.0
                dpos, dneg = -active, active

            # d/d emb rows; hidden == emb[input] so input row gets the
            # score gradients through u as well.
            grads[pos, :d] += dpos * u
            grads[pos, d] += dpos
            grads[neg, :d] += dneg * u
            grads[neg, d] += dneg
            grads[inputs[i, j], :d] += dpos * emb[pos] + dneg * emb[neg]
            touched[[inputs[i, j], pos, neg]] = True
            bias_touched[[pos, neg]] = True

    col_touched = np.concatenate(
        [np.repeat(touched[:, None], d, axis=1), bias_touched[:, None]], axis=1
    )
    g = grads + l2 * table * col_touched
    acc = g * g
    new_table = table - lr * g / np.sqrt(acc + ADAGRAD_EPS)
    new_table = np.where(col_touched, new_table, table)
    return loss_sum, new_table


@pytest.mark.parametrize("loss", [Loss.HINGE, Loss.WARP, Loss.BPR])
@pytest.mark.parametrize("sparse", [False, True])
def test_one_step_matches_numpy_reference(loss, sparse):
    n, d, b, t = 23, 8, 4, 5
    lr, l2 = 0.1, 0.01
    rng = np.random.default_rng(0)

    params = init_embedding_params(jax.random.PRNGKey(1), n, d)
    table0 = jnp.asarray(rng.normal(size=(n, d + 1)).astype(np.float32))
    params["item_table"] = table0
    params["tower"] = {}

    cfg = EngineConfig(
        num_items=n, loss=loss, optimizer=Optimizer.ADAGRAD,
        learning_rate=lr, l2_penalty=l2, sparse_updates=sparse,
    )
    step_fn = make_train_step(cfg, _identity_tower)
    opt_state = init_opt_state(Optimizer.ADAGRAD, params)

    # Stream layout: input at position t is stream[t], its target is
    # stream[t+1] (sbr_rs_tpu.data.StreamWindows).
    stream = rng.integers(0, n, (b, t + 1)).astype(np.int32)
    inputs = stream[:, :t]
    targets = stream[:, 1:]
    mask = (rng.random((b, t)) > 0.3).astype(np.float32)
    batch = {
        "stream": jnp.asarray(stream),
        "mask": jnp.asarray(mask),
    }
    key = jax.random.PRNGKey(7)

    new_params, _, loss_sum = step_fn(params, opt_state, key, batch)

    # Recover the engine's candidate draws (same key, same shape).
    k_cand = 5 if loss == Loss.WARP else 1
    candidates = np.asarray(
        jax.random.randint(key, (b, t, k_cand), 0, n, dtype=jnp.int32)
    )
    want_loss, want_table = _numpy_reference_step(
        np.asarray(table0), inputs, targets, mask, candidates,
        loss, lr, l2,
    )

    got_table = np.asarray(new_params["item_table"])

    np.testing.assert_allclose(float(loss_sum), want_loss, rtol=1e-5)
    # atol: when a row's occurrence gradients nearly cancel (g ~ 1e-5),
    # Adagrad's g/sqrt(g^2 + eps) amplifies float-association differences
    # between XLA's scatter order and the numpy loop into ~lr * 1e-2
    # relative update error. Real semantic bugs (wrong occurrence sets, L2,
    # formulas) produce errors orders of magnitude above this bound.
    np.testing.assert_allclose(got_table, want_table, rtol=2e-4, atol=1e-3)


def test_warp_step_traces_one_tower_forward():
    """The WARP selection pass shares the primal tower forward.

    Selection runs on stop_gradient'd views of the single forward inside
    the differentiated loss (engine.py scored_loss) — a separate selection
    forward measured ~8% of the device step, and XLA CSE cannot be relied
    on to merge duplicate Mosaic custom calls under shard_map. Tracing the
    step must therefore invoke the tower exactly once.
    """
    n, d, b, t = 23, 8, 4, 5
    calls = []

    def counting_tower(tower_params, x, starts=None):
        calls.append(x.shape)
        return x

    params = init_embedding_params(jax.random.PRNGKey(1), n, d)
    params["tower"] = {}
    cfg = EngineConfig(
        num_items=n, loss=Loss.WARP, optimizer=Optimizer.ADAGRAD,
        learning_rate=0.1, l2_penalty=0.01, sparse_updates=False,
    )
    step_fn = make_train_step(cfg, counting_tower)
    opt_state = init_opt_state(Optimizer.ADAGRAD, params)
    batch = {
        "stream": jnp.zeros((b, t + 1), jnp.int32),
        "mask": jnp.ones((b, t), jnp.float32),
    }
    jax.make_jaxpr(
        lambda p, o, k, bt: step_fn(p, o, k, bt)[2]
    )(params, opt_state, jax.random.PRNGKey(7), batch)
    assert len(calls) == 1, f"tower traced {len(calls)} times: {calls}"
