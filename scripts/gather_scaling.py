"""Cost model of jnp.take / scatter-add on TPU: slope (ns/row) vs intercept.

Harness rules (learned the hard way, see CLAUDE.md):
- every iteration's indices depend on the carry through a value XLA cannot
  constant-fold (carry > 1e30 is always False, but XLA can't prove it), so
  nothing hoists out of the loop;
- the carry consumes ALL gathered rows (sum over the row axis), so no DCE.

Usage: python scripts/gather_scaling.py [N]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

N_STEPS = 100


def timeit(name, fn, carry0, *args):
    @jax.jit
    def run(carry, *a):
        def body(i, carry):
            return fn(carry, *a)

        return jax.lax.fori_loop(0, N_STEPS, body, carry)

    out = run(carry0, *args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(run(carry0, *args))
        best = min(best, (time.perf_counter() - t0) / N_STEPS)
    print(f"{name:44s} {best * 1e6:9.1f} us")
    return best


def shift_of(carry):
    # always 0, but data-dependent as far as XLA can prove
    return (carry[0] > 1e30).astype(jnp.int32)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1683
    rng = np.random.default_rng(0)
    print(f"N={n} device={jax.devices()[0]}")
    results = {}

    for c in (33, 128):
        table = jnp.asarray(rng.normal(size=(n, c)), jnp.float32)
        for m in (8192, 16384, 32768, 65536):
            idx = jnp.asarray(rng.integers(0, n, m), jnp.int32)

            def take_fn(carry, table, idx):
                rows = jnp.take(table, idx + shift_of(carry), axis=0, mode="clip")
                return carry + rows.sum(0) * 1e-9

            t = timeit(f"take     M={m:6d} C={c}", take_fn, jnp.zeros((c,)), table, idx)
            results[("take", m, c)] = t

            g = jnp.asarray(rng.normal(size=(m, c)), jnp.float32)

            def scat_fn(carry, idx, g):
                d = jnp.zeros((n, c), jnp.float32).at[
                    idx + shift_of(carry)
                ].add(g, mode="drop")
                return carry + d.sum(0) * 1e-9

            t = timeit(f"scat-add M={m:6d} C={c}", scat_fn, jnp.zeros((c,)), idx, g)
            results[("scat", m, c)] = t

    for kind in ("take", "scat"):
        for c in (33, 128):
            t1, t2 = results[(kind, 16384, c)], results[(kind, 65536, c)]
            slope = (t2 - t1) / (65536 - 16384) * 1e9
            icept = t1 - (t2 - t1) / (65536 - 16384) * 16384
            print(f"{kind} C={c}: slope {slope:6.2f} ns/row, intercept {icept*1e6:7.1f} us")


if __name__ == "__main__":
    main()
