"""Locate the fixed per-step cost: time stripped-down step variants.

Each variant runs N steps inside ONE jitted fori_loop with the params
threaded through as a real dependency (CLAUDE.md: XLA optimizes through
naive reduction harnesses; the axon tunnel adds ~0.5 ms per dispatch).

Usage: python scripts/step_ablation.py [B] [T] [ITEMS] [DIM]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from sbr_rs_tpu.models import Loss, Optimizer
from sbr_rs_tpu.models.engine import (
    EngineConfig,
    init_embedding_params,
    init_opt_state,
    make_train_step,
)
from sbr_rs_tpu.models.towers import init_lstm, lstm_apply
from sbr_rs_tpu.ops.losses import pairwise_loss
from sbr_rs_tpu.ops.sampling import WARP_CANDIDATES, warp_select

N_STEPS = 100


def time_step(name, step_fn, params, opt_state, batch):
    @jax.jit
    def run(params, opt_state, key):
        def body(i, carry):
            params, opt_state, _ = carry
            k = jax.random.fold_in(key, i)
            return step_fn(params, opt_state, k, batch)

        return jax.lax.fori_loop(0, N_STEPS, body, (params, opt_state, jnp.zeros(())))

    out = run(params, opt_state, jax.random.PRNGKey(0))
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(params, opt_state, jax.random.PRNGKey(1))
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / N_STEPS)
    print(f"{name:44s} {best * 1e6:8.1f} us/step")
    return best


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    t = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    items = int(sys.argv[3]) if len(sys.argv) > 3 else 1683
    dim = int(sys.argv[4]) if len(sys.argv) > 4 else 32
    print(f"B={b} T={t} items={items} dim={dim} device={jax.devices()[0]}")

    rng = np.random.default_rng(0)
    batch = {
        "inputs": jnp.asarray(rng.integers(0, items, (b, t)), jnp.int32),
        "targets": jnp.asarray(rng.integers(0, items, (b, t)), jnp.int32),
        "mask": jnp.ones((b, t), jnp.float32),
    }
    key = jax.random.PRNGKey(0)
    params = init_embedding_params(key, items, dim)
    params["tower"] = init_lstm(key, dim, False)
    opt_state = init_opt_state(Optimizer.ADAGRAD, params)

    bt = b * t

    # --- variants, least to most work -------------------------------------

    def v_empty(params, opt_state, key, batch):
        # pure pass-through with a key-dependent scalar
        return params, opt_state, jax.random.uniform(key, ())

    def v_sample(params, opt_state, key, batch):
        cand = jax.random.randint(key, (b, t, 5), 0, items, dtype=jnp.int32)
        return params, opt_state, jnp.sum(cand).astype(jnp.float32)

    def v_gather_ip(params, opt_state, key, batch):
        table = params["item_table"]
        rows = jnp.take(
            table,
            jnp.concatenate(
                [batch["inputs"].reshape(-1), batch["targets"].reshape(-1)]
            ),
            axis=0,
        )
        # key-dependence so iterations can't collapse
        return params, opt_state, rows.sum() + jax.random.uniform(key, ())

    def v_gather_all(params, opt_state, key, batch):
        table = params["item_table"]
        cand = jax.random.randint(key, (b, t, 5), 0, items, dtype=jnp.int32)
        idx = jnp.concatenate(
            [
                batch["inputs"].reshape(-1),
                batch["targets"].reshape(-1),
                cand.reshape(-1),
            ]
        )
        rows = jnp.take(table, idx, axis=0)
        return params, opt_state, rows.sum()

    def v_fwd_loss(params, opt_state, key, batch):
        # full forward: gathers + tower + warp select + loss (no grad/update)
        table = params["item_table"]
        inputs, targets, mask = batch["inputs"], batch["targets"], batch["mask"]
        cand = jax.random.randint(key, (b, t, 5), 0, items, dtype=jnp.int32)
        rows_ip = jnp.take(
            table, jnp.concatenate([inputs.reshape(-1), targets.reshape(-1)]), axis=0
        )
        in_emb = rows_ip[:bt, :-1].reshape(b, t, -1)
        hidden = lstm_apply(params["tower"], in_emb, coupled=False)
        haug = jnp.concatenate([hidden, jnp.ones((b, t, 1), hidden.dtype)], -1)
        pos = jnp.einsum("bte,bte->bt", haug, rows_ip[bt:].reshape(b, t, -1))
        cand_rows = jnp.take(table, cand.reshape(-1), axis=0)
        cscore = jnp.einsum("bte,btke->btk", haug, cand_rows.reshape(b, t, 5, -1))
        sel = warp_select(pos, cscore)
        neg = jnp.take_along_axis(cscore, sel[..., None], axis=-1)[..., 0]
        losses = pairwise_loss(Loss.WARP, pos, neg)
        return params, opt_state, jnp.sum(losses * mask)

    def v_grad_noupdate(params, opt_state, key, batch):
        # forward + backward, but params returned unchanged (no optimizer)
        table = params["item_table"]
        inputs, targets, mask = batch["inputs"], batch["targets"], batch["mask"]
        rows_ip = jnp.take(
            table, jnp.concatenate([inputs.reshape(-1), targets.reshape(-1)]), axis=0
        )
        neg_ids = jax.random.randint(key, (b, t), 0, items, dtype=jnp.int32)
        neg_rows = jnp.take(table, neg_ids.reshape(-1), axis=0)

        def loss_fn(rows_ip, neg_rows, tower):
            in_emb = rows_ip[:bt, :-1].reshape(b, t, -1)
            hidden = lstm_apply(tower, in_emb, coupled=False)
            haug = jnp.concatenate([hidden, jnp.ones((b, t, 1), hidden.dtype)], -1)
            pos = jnp.einsum("bte,bte->bt", haug, rows_ip[bt:].reshape(b, t, -1))
            neg = jnp.einsum("bte,bte->bt", haug, neg_rows.reshape(b, t, -1))
            return jnp.sum(pairwise_loss(Loss.HINGE, pos, neg) * mask)

        loss, grads = jax.value_and_grad(loss_fn, argnums=(0, 1, 2))(
            rows_ip, neg_rows, params["tower"]
        )
        flat = sum(jnp.sum(g) for g in jax.tree_util.tree_leaves(grads))
        return params, opt_state, loss + flat

    def v_scatter_only(params, opt_state, key, batch):
        # 3*BT-row scatter-add + dense table update, nothing else
        table = params["item_table"]
        idx = jax.random.randint(key, (3 * bt,), 0, items, dtype=jnp.int32)
        payload = jnp.ones((3 * bt, table.shape[1] + 2), table.dtype)
        d_aug = (
            jnp.zeros((items, payload.shape[1]), payload.dtype)
            .at[idx]
            .add(payload, mode="drop")
        )
        new_table = table - 0.001 * d_aug[:, :-2]
        params = dict(params, item_table=new_table)
        return params, opt_state, d_aug.sum()

    cfg_dense = EngineConfig(
        num_items=items, loss=Loss.WARP, optimizer=Optimizer.ADAGRAD,
        learning_rate=0.1, l2_penalty=4e-4, sparse_updates=False,
    )
    cfg_hinge = EngineConfig(
        num_items=items, loss=Loss.HINGE, optimizer=Optimizer.ADAGRAD,
        learning_rate=0.1, l2_penalty=4e-4, sparse_updates=False,
    )

    def tower_scan(p, x, starts=None):
        return lstm_apply(p, x, coupled=False, starts=starts)

    variants = [
        ("empty", v_empty),
        ("sample 5BT candidates", v_sample),
        ("gather 2BT rows", v_gather_ip),
        ("gather 7BT rows (+sample)", v_gather_all),
        ("fwd loss (warp, no grad)", v_fwd_loss),
        ("grad no-update (hinge)", v_grad_noupdate),
        ("scatter+update only (3BT rows)", v_scatter_only),
        ("FULL warp dense", make_train_step(cfg_dense, tower_scan)),
        ("FULL hinge dense", make_train_step(cfg_hinge, tower_scan)),
    ]
    for name, fn in variants:
        time_step(name, fn, params, opt_state, batch)


if __name__ == "__main__":
    main()
