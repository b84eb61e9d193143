"""Microbenchmark: Pallas fused LSTM tower vs lax.scan tower on the TPU.

Usage: python scripts/kernel_bench.py [B] [T] [D]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from sbr_rs_tpu.models.towers import init_lstm, lstm_apply
from sbr_rs_tpu.ops.pallas_lstm import lstm_apply_pallas


def timeit(fn, *args, n=50):
    fn(*args)[0].block_until_ready() if isinstance(fn(*args), tuple) else jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    t = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    d = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    print(f"B={b} T={t} D={d} device={jax.devices()[0]}")

    for coupled in (False, True):
        params = init_lstm(jax.random.PRNGKey(0), d, coupled)
        x = jax.random.normal(jax.random.PRNGKey(1), (b, t, d))

        scan_fwd = jax.jit(lambda p, xx: lstm_apply(p, xx, coupled=coupled))
        pallas_fwd = jax.jit(lambda p, xx: lstm_apply_pallas(p, xx, coupled=coupled))

        diff = float(jnp.abs(scan_fwd(params, x) - pallas_fwd(params, x)).max())
        ts = timeit(scan_fwd, params, x)
        tp = timeit(pallas_fwd, params, x)
        print(
            f"coupled={coupled}: scan={ts * 1e6:.0f}us pallas={tp * 1e6:.0f}us "
            f"speedup={ts / tp:.2f}x maxdiff={diff:.2e}"
        )

        # forward+backward (training path)
        def loss_scan(p, xx):
            return jnp.sum(lstm_apply(p, xx, coupled=coupled) ** 2)

        def loss_pallas(p, xx):
            return jnp.sum(lstm_apply_pallas(p, xx, coupled=coupled) ** 2)

        g_scan = jax.jit(jax.grad(loss_scan))
        g_pallas = jax.jit(jax.grad(loss_pallas))
        tgs = timeit(g_scan, params, x, n=20)
        tgp = timeit(g_pallas, params, x, n=20)
        print(f"  grad: scan={tgs * 1e6:.0f}us pallas={tgp * 1e6:.0f}us speedup={tgs / tgp:.2f}x")


if __name__ == "__main__":
    main()
