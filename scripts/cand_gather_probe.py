"""Measure: can a Pallas kernel own the WARP candidate gather+score block?

VERDICT r2 item 4: the headline step's candidate block — gather 62 us +
score einsum 55 us + selection/layout inside the ~100 us misc tail — is
~40% of the 417 us step. The round-2 fused-reduce attempt was net-zero
because it did not own the GATHER; this probe measures the kernel that
does: candidate rows are fetched inside the kernel and reduced against the
augmented hidden state in place, so the [B, T, K, C] candidate block never
round-trips HBM.

Variants measured against the XLA baseline (gather + einsum):

1. ``xla_baseline``  — jnp.take + einsum("bte,btke->btk") (the shipped path).
2. ``pallas_vmem_table`` — the whole fused table resident in VMEM (fits
   for ML-100K-scale catalogs: 1683 rows x 128 lanes x 4 B = 862 KB of
   ~16 MB), grid over position tiles, in-kernel fori_loop doing dynamic
   row reads + dot per candidate.
3. ``pallas_grid_row`` — one candidate row per grid step via scalar-
   prefetched indices (the BlockSpec index_map fetches table[id] as the
   step's block), dot in kernel. Mosaic's ~40 ns/grid-step overhead
   (scripts/row_pipeline_probe.py) predicts ~1.6 ms for 41k rows.

Shapes mirror the headline bench step: B=256, T=32, K=5, catalog 1683,
fused row C=33 (dim 32 + bias).

Usage: python scripts/cand_gather_probe.py  (on the TPU backend)
"""

from __future__ import annotations

import functools
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
N, C = 1683, 33  # ML-100K catalog, dim 32 + bias column
BT = B * T
POS_TILE = 256  # positions per grid step for the VMEM-table kernel


def xla_baseline(table, haug, cand):
    rows = jnp.take(table, cand.reshape(-1), axis=0).reshape(BT, K, C)
    return jnp.einsum("pe,pke->pk", haug, rows)


# -- variant 2: VMEM-resident table, in-kernel dynamic row reads ------------


def _vmem_kernel(cand_ref, table_ref, haug_ref, out_ref):
    # table_ref: [N, C] VMEM (whole catalog); haug_ref: [POS_TILE, C];
    # cand_ref: [POS_TILE, K] int32 (VMEM); out: [POS_TILE, K].
    def body(p, _):
        h = haug_ref[p, :]  # [C]
        for k in range(K):
            row = table_ref[cand_ref[p, k], :]  # dynamic row read
            out_ref[p, k] = jnp.sum(h * row)
        return _

    jax.lax.fori_loop(0, POS_TILE, body, 0)


def pallas_vmem_table(table, haug, cand):
    grid = (BT // POS_TILE,)
    return pl.pallas_call(
        _vmem_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((POS_TILE, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((POS_TILE, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((POS_TILE, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BT, K), jnp.float32),
    )(cand, table, haug)


# -- variant 3: one gathered row per grid step via scalar prefetch ----------


def _grid_row_kernel(cand_flat_ref, table_row_ref, haug_ref, out_ref):
    # table_row_ref: [1, C] — the candidate row selected by index_map.
    i = pl.program_id(0)
    p = i // K
    out_ref[0, 0] = jnp.sum(haug_ref[0, :] * table_row_ref[0, :])
    del p


def pallas_grid_row(table, haug, cand):
    cand_flat = cand.reshape(-1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(BT * K,),
        in_specs=[
            pl.BlockSpec((1, C), lambda i, cf: (cf[i], 0)),
            pl.BlockSpec((1, C), lambda i, cf: (i // K, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1), lambda i, cf: (i, 0)),
    )
    return pl.pallas_call(
        _grid_row_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((BT * K, 1), jnp.float32),
    )(cand_flat, table, haug).reshape(BT, K)


def bench(name, fn, *args, iters=20):
    f = jax.jit(fn)
    try:
        r = f(*args)
        np.asarray(r)
    except Exception as e:  # pragma: no cover - probe tool
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}")
        return None
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            r = f(*args)
        np.asarray(r)
        best = min(best, (time.perf_counter() - t0) / iters)
    print(f"{name}: {best*1e6:.1f} us/call")
    return best


def main():
    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (N, C), jnp.float32)
    haug = jax.random.normal(key, (BT, C), jnp.float32)
    cand = jax.random.randint(key, (BT, K), 0, N, jnp.int32)

    base = bench("xla_baseline (take + einsum)", xla_baseline, table, haug, cand)
    v2 = bench("pallas_vmem_table", pallas_vmem_table, table, haug, cand)
    v3 = bench("pallas_grid_row", pallas_grid_row, table, haug, cand)

    # correctness spot-check for whichever kernels ran
    want = np.asarray(xla_baseline(table, haug, cand))
    for name, fn in [("vmem", pallas_vmem_table), ("grid", pallas_grid_row)]:
        try:
            got = np.asarray(jax.jit(fn)(table, haug, cand))
            err = np.abs(got - want).max()
            print(f"{name} max err vs baseline: {err:.2e}")
        except Exception:
            pass
    del base, v2, v3


if __name__ == "__main__":
    main()
