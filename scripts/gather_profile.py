"""Compare row-gather/scatter strategies on TPU for the training step.

Strategies for rows = table[idx] with M indices over an [N, C] table:
  take        — jnp.take (XLA gather)
  take_pad128 — jnp.take from a table padded to 128 lanes
  onehot      — one_hot(idx) @ table on the MXU (f32, exact for 0/1)

And for the transposed scatter-add (d_table = sum of row grads):
  scatter     — zeros.at[idx].add(g)
  onehot_t    — one_hot(idx).T @ g

Usage: python scripts/gather_profile.py [M] [N] [C]
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


def timeit(fn, *args):
    @jax.jit
    def run(*a):
        def body(i, acc):
            return acc + fn(*a, i).sum()

        return jax.lax.fori_loop(0, ITERS, body, jnp.zeros(()))

    jax.block_until_ready(run(*args))
    t0 = time.perf_counter()
    jax.block_until_ready(run(*args))
    return (time.perf_counter() - t0) / ITERS


def main():
    m = int(sys.argv[1]) if len(sys.argv) > 1 else 114688
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 1683
    c = int(sys.argv[3]) if len(sys.argv) > 3 else 33
    print(f"M={m} N={n} C={c} device={jax.devices()[0]}")

    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, n, m), jnp.int32)
    table = jnp.asarray(rng.normal(size=(n, c)), jnp.float32)
    c_pad = -(-c // 128) * 128
    table_pad = jnp.pad(table, ((0, 0), (0, c_pad - c)))
    g = jnp.asarray(rng.normal(size=(m, c)), jnp.float32)

    def take(_unused, i):
        return jnp.take(table, (idx + i) % n, axis=0)

    def take_pad(_unused, i):
        return jnp.take(table_pad, (idx + i) % n, axis=0)

    def onehot(_unused, i):
        oh = jax.nn.one_hot((idx + i) % n, n, dtype=jnp.float32)
        return jnp.dot(oh, table, preferred_element_type=jnp.float32)

    def scatter(_unused, i):
        return jnp.zeros((n, c), jnp.float32).at[(idx + i) % n].add(g)

    def onehot_t(_unused, i):
        oh = jax.nn.one_hot((idx + i) % n, n, dtype=jnp.float32)
        return jnp.dot(oh.T, g, preferred_element_type=jnp.float32)

    for name, fn in [
        ("take", take),
        ("take_pad128", take_pad),
        ("onehot", onehot),
        ("scatter", scatter),
        ("onehot_t", onehot_t),
    ]:
        t = timeit(fn, jnp.zeros((1,)))
        print(f"{name:12s} {t * 1e6:8.0f} us")


if __name__ == "__main__":
    main()
