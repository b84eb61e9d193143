"""MEASURED KILL: a Pallas kernel cannot own the WARP candidate gather+score.

VERDICT r2 item 4 asked for one Pallas kernel owning the candidate
gather+score block (gather 62 us + einsum 55 us of the 417 us headline
step), or a measured kill note. This is the kill note's instrument.

Results (one v5e, headline shapes B=256, T=32, K=5 -> 40,960 scattered
row reads/step; physical layout [*, 128] lanes, catalog 1688 rows; timing
inside ONE compiled program, 100-iteration lax.scan threading a real
dependency — per-dispatch tunnel RTT would otherwise swamp the kernels):

| variant                                            | us/iter | vs XLA |
|----------------------------------------------------|---------|--------|
| XLA take + einsum (the shipped path)               |     387 |   1.0x |
| Pallas, table VMEM-resident, dynamic row reads     |    1382 |   3.6x |
|   + 8-position unroll (amortize fori_loop)         |     506 |   1.3x |
| Pallas, per-row DMAs HBM->VMEM (16 sems, batched)  |    4817 |  12.4x |

Why each loses (extends scripts/row_pipeline_probe.py's scatter findings
to gathers):

* BlockSpec-indexed fetches cannot express scattered rows at all: Mosaic
  requires the second-minor block dim divisible by 8, so a (1, C) "one
  table row per grid step" block is rejected outright.
* In-kernel dynamic VMEM reads (``table_ref[idx, :]``) cost ~34 ns/row
  inside a fori_loop and ~12 ns/row fully unrolled x8 — the dynamic
  sublane-addressing + loop-carry overhead dwarfs XLA's native gather at
  ~1.5 ns/row (the hardware serial row-copy floor, ARCHITECTURE.md
  "Row-traffic roofline"). Even with the score reduction fused in free,
  the kernel is 1.3x slower than gather + einsum SEPARATELY.
* Per-row DMAs pay ~118 ns/row of issue+semaphore cost — 80x the row
  copy itself. (Same order as Mosaic's ~40 ns/grid-step overhead.)

Mosaic lowering facts hit on the way (kept for future kernel work):
* jnp.stack of scalars / ``acc.at[k].set`` inside a kernel lower to
  ``scatter`` — unimplemented; build small vectors with
  ``jnp.concatenate([x.reshape(1, 1), ...])`` instead.
* Scalar-prefetch operands live in SMEM: a [8192, 5] int32 index array
  (160 KB) CRASHES the compiler (opaque HTTP 500 from the compile
  helper); pass per-tile index blocks via
  ``pl.BlockSpec(..., memory_space=pltpu.SMEM)`` instead.
* Unaligned VMEM blocks ((1683, 33)) also crash outright — pad to
  (8k, 128) tiles first.

Conclusion: on TPU, scattered row access is only fast through XLA's own
gather machinery; kernels win by REMOVING row traffic (layout, selection
rules), not by re-implementing it. The shipped engine already minimizes
rows (STREAM layout, stop_gradient candidates, one-hot selection).

Usage: python scripts/cand_gather_probe.py  (TPU backend; reproduces the
table above)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, T, K = 256, 32, 5
N, C = 1688, 128  # physical tile-aligned layout (logical: 1683 x 33)
BT = B * T
POS_TILE = 128
ITERS = 100
UNROLL = 8


def xla_baseline(table, haug, cand):
    rows = jnp.take(table, cand.reshape(-1), axis=0).reshape(BT, K, C)
    return jnp.einsum("pe,pke->pk", haug, rows)


def _vmem_kernel(cand_ref, table_ref, haug_ref, out_ref):
    def body(p, _):
        h = haug_ref[p, :]
        parts = []
        for k in range(K):
            idx = cand_ref[p, k]
            parts.append(jnp.sum(h * table_ref[idx, :]).reshape(1, 1))
        out_ref[pl.ds(p, 1), :] = jnp.concatenate(parts, axis=1)
        return _

    jax.lax.fori_loop(0, POS_TILE, body, 0)


def _vmem_kernel_unroll(cand_ref, table_ref, haug_ref, out_ref):
    def body(q, _):
        outs = []
        for u in range(UNROLL):
            p = q * UNROLL + u
            h = haug_ref[p, :]
            parts = []
            for k in range(K):
                idx = cand_ref[p, k]
                parts.append(jnp.sum(h * table_ref[idx, :]).reshape(1, 1))
            outs.append(jnp.concatenate(parts, axis=1))
        out_ref[pl.ds(q * UNROLL, UNROLL), :] = jnp.concatenate(outs, axis=0)
        return _

    jax.lax.fori_loop(0, POS_TILE // UNROLL, body, 0)


def _make_vmem(kernel):
    def run(table, haug, cand):
        return pl.pallas_call(
            kernel,
            grid=(BT // POS_TILE,),
            in_specs=[
                pl.BlockSpec(
                    (POS_TILE, K), lambda i: (i, 0), memory_space=pltpu.SMEM
                ),
                pl.BlockSpec((N, C), lambda i: (0, 0)),
                pl.BlockSpec((POS_TILE, C), lambda i: (i, 0)),
            ],
            out_specs=pl.BlockSpec((POS_TILE, K), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((BT, K), jnp.float32),
        )(cand, table, haug)

    return run


def _dma_kernel(cand_ref, table_hbm, haug_ref, out_ref, rows_scratch, sems):
    def issue(j, _):
        p, k = j // K, j % K
        idx = cand_ref[p, k]
        pltpu.make_async_copy(
            table_hbm.at[pl.ds(idx, 1), :],
            rows_scratch.at[pl.ds(j, 1), :],
            sems.at[j % 16],
        ).start()
        return _

    jax.lax.fori_loop(0, POS_TILE * K, issue, 0)

    def wait(j, _):
        pltpu.make_async_copy(
            table_hbm.at[pl.ds(0, 1), :],
            rows_scratch.at[pl.ds(j, 1), :],
            sems.at[j % 16],
        ).wait()
        return _

    jax.lax.fori_loop(0, POS_TILE * K, wait, 0)
    rows = rows_scratch[:].reshape(POS_TILE, K, C)
    out_ref[:] = jnp.sum(rows * haug_ref[:].reshape(POS_TILE, 1, C), axis=2)


def pallas_dma_rows(table, haug, cand):
    return pl.pallas_call(
        _dma_kernel,
        grid=(BT // POS_TILE,),
        in_specs=[
            pl.BlockSpec((POS_TILE, K), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((POS_TILE, C), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((POS_TILE, K), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((BT, K), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((POS_TILE * K, C), jnp.float32),
            pltpu.SemaphoreType.DMA((16,)),
        ],
    )(cand, table, haug)


def bench(name, fn, table, haug, cand, iters=ITERS):
    def many(table, haug, cand):
        def step(h, _):
            out = fn(table, h, cand)
            h = h + out[:, :1] * 1e-30  # real dependency: no hoist/DCE
            return h, jnp.sum(out)

        h, sums = jax.lax.scan(step, haug, None, length=iters)
        return jnp.sum(sums) + jnp.sum(h)

    f = jax.jit(many)
    try:
        float(f(table, haug, cand))
    except Exception as e:  # pragma: no cover - probe tool
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}")
        return
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(f(table, haug, cand))
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best/iters*1e6:.1f} us/iter")


def main():
    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (N, C), jnp.float32)
    haug = jax.random.normal(key, (BT, C), jnp.float32)
    cand = jax.random.randint(key, (BT, K), 0, N, jnp.int32)

    want = np.asarray(xla_baseline(table, haug, cand))
    variants = [
        ("pallas_vmem_table", _make_vmem(_vmem_kernel), ITERS),
        ("pallas_vmem_unroll8", _make_vmem(_vmem_kernel_unroll), ITERS),
        ("pallas_dma_rows", pallas_dma_rows, 10),
    ]
    for name, fn, _ in variants:
        try:
            got = np.asarray(jax.jit(fn)(table, haug, cand))
            print(f"{name} max err vs baseline: {np.abs(got - want).max():.2e}")
        except Exception as e:
            print(f"{name}: BUILD FAILED {type(e).__name__}: {str(e)[:200]}")

    bench("xla_baseline (take + einsum)", xla_baseline, table, haug, cand)
    for name, fn, iters in variants:
        bench(name, fn, table, haug, cand, iters=iters)


if __name__ == "__main__":
    main()
