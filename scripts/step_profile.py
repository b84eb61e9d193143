"""Isolate the train-step bottleneck: time step variants on device.

Runs N steps inside ONE jitted fori_loop per variant (the axon tunnel adds
~0.5 ms per dispatch, so per-step timing must amortize it).

Usage: python scripts/step_profile.py [B] [T] [ITEMS] [DIM]
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
from sbr_rs_tpu.models.engine import EngineConfig, init_embedding_params, init_opt_state, make_train_step
from sbr_rs_tpu.models.towers import init_lstm, lstm_apply
from sbr_rs_tpu.ops.pallas_lstm import lstm_apply_pallas

N_STEPS = 50


def time_variant(name, step_fn, params, opt_state, batch):
    @jax.jit
    def run(params, opt_state, key):
        def body(i, carry):
            params, opt_state, _ = carry
            k = jax.random.fold_in(key, i)
            return step_fn(params, opt_state, k, batch)

        return jax.lax.fori_loop(0, N_STEPS, body, (params, opt_state, jnp.zeros(())))

    out = run(params, opt_state, jax.random.PRNGKey(0))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = run(params, opt_state, jax.random.PRNGKey(1))
    jax.block_until_ready(out)
    per_step = (time.perf_counter() - t0) / N_STEPS
    print(f"{name:40s} {per_step * 1e6:8.0f} us/step")
    return per_step


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    t = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    items = int(sys.argv[3]) if len(sys.argv) > 3 else 1683
    dim = int(sys.argv[4]) if len(sys.argv) > 4 else 32
    print(f"B={b} T={t} items={items} dim={dim} device={jax.devices()[0]}")

    rng = np.random.default_rng(0)
    batch = {
        "stream": jnp.asarray(rng.integers(0, items, (b, t + 1)), jnp.int32),
        "mask": jnp.ones((b, t), jnp.float32),
    }
    key = jax.random.PRNGKey(0)
    params = init_embedding_params(key, items, dim)
    params["tower"] = init_lstm(key, dim, False)

    def tower_scan(p, x, starts=None):
        return lstm_apply(p, x, coupled=False, starts=starts)

    def tower_pallas(p, x, starts=None):
        return lstm_apply_pallas(p, x, coupled=False, starts=starts)

    def tower_none(p, x, starts=None):
        return x  # identity: no recurrence

    variants = [
        ("warp dense scan", Loss.WARP, False, tower_scan),
        ("warp dense pallas", Loss.WARP, False, tower_pallas),
        ("warp sparse pallas", Loss.WARP, True, tower_pallas),
        ("hinge dense pallas", Loss.HINGE, False, tower_pallas),
        ("hinge sparse pallas", Loss.HINGE, True, tower_pallas),
        ("warp dense NO-TOWER", Loss.WARP, False, tower_none),
        ("hinge dense NO-TOWER", Loss.HINGE, False, tower_none),
    ]
    for name, loss, sparse, tower in variants:
        cfg = EngineConfig(
            num_items=items, loss=loss,
            optimizer=Optimizer.ADAGRAD, learning_rate=0.1, l2_penalty=4e-4,
            sparse_updates=sparse,
        )
        step = make_train_step(cfg, tower)
        opt_state = init_opt_state(Optimizer.ADAGRAD, params)
        time_variant(name, step, params, opt_state, batch)


if __name__ == "__main__":
    main()
