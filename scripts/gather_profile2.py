"""Building blocks for a full-matrix (gather-free) small-catalog step.

Usage: python scripts/gather_profile2.py [BT] [N] [C]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 30


def timeit(name, fn, *args):
    @jax.jit
    def run(*a):
        def body(i, acc):
            return acc + fn(*a, i).sum()

        return jax.lax.fori_loop(0, ITERS, body, jnp.zeros(()))

    jax.block_until_ready(run(*args))
    t0 = time.perf_counter()
    jax.block_until_ready(run(*args))
    t = (time.perf_counter() - t0) / ITERS
    print(f"{name:28s} {t * 1e6:8.0f} us")


def main():
    bt = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 1683
    c = int(sys.argv[3]) if len(sys.argv) > 3 else 33
    print(f"BT={bt} N={n} C={c} device={jax.devices()[0]}")

    rng = np.random.default_rng(0)
    hidden = jnp.asarray(rng.normal(size=(bt, c)), jnp.float32)
    table = jnp.asarray(rng.normal(size=(n, c)), jnp.float32)
    idx7 = jnp.asarray(rng.integers(0, n, (bt, 7)), jnp.int32)
    idx1 = jnp.asarray(rng.integers(0, n, (bt,)), jnp.int32)
    scores = hidden @ table.T
    g7 = jnp.asarray(rng.normal(size=(bt, 7)), jnp.float32)

    timeit("score matmul [BT,C]@[C,N]", lambda i: (hidden + i) @ table.T)
    timeit("extract take_along_axis 7", lambda i: jnp.take_along_axis(scores, (idx7 + i) % n, axis=1))
    timeit("extract take_along_axis 1", lambda i: jnp.take_along_axis(scores, ((idx1 + i) % n)[:, None], axis=1))
    timeit("scatter 7 scalars/row", lambda i: jnp.zeros((bt, n), jnp.float32).at[jnp.arange(bt)[:, None], (idx7 + i) % n].add(g7))
    timeit("row gather BT rows", lambda i: jnp.take(table, (idx1 + i) % n, axis=0))
    timeit("d_table matmul [N,BT]@[BT,C]", lambda i: scores.T @ (hidden + i))
    # one-hot variants for the extraction (VPU multiply-reduce)
    timeit("extract onehot-dot 1", lambda i: (scores * jax.nn.one_hot((idx1 + i) % n, n)).sum(-1))


if __name__ == "__main__":
    main()
