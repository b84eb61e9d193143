"""Probe: Pallas scalar-prefetch row pipeline vs XLA gather/scatter at 10M rows.

Measures (via jax.profiler trace — the only reliable harness on this
backend) three ops over a [N, 128] f32 table with M unique sorted indices:

  xla_gather   — jnp.take                     (baseline ~8.3 ns/row)
  pl_gather    — pallas pipeline, one row per grid step, block index_map
                 reads the prefetched index
  pl_rmw       — pallas pipeline read-modify-write: table[idx[i]] += g[i],
                 aliased output              (XLA scatter baseline ~70 ns/row)

STATUS (round 2, MEASURED — two strikes):
1. Mosaic rejects (1, C) blocks (last two block dims must divide (8, 128)),
   so a row pipeline fetches 8-row blocks: 8x read amplification and a
   same-block write-hazard needing a block-run merge.
2. An 8-row-block pipelined GATHER probe measured ~40 ns PER GRID STEP of
   Mosaic overhead (1.3 ms for 33k steps) vs ~4-8 ns/row for XLA's own
   gather — one-index-per-grid-step kernels lose by 5-10x before the RMW
   even starts. A viable kernel must process MANY indices per grid step
   via manual per-row DMAs, which pays per-descriptor costs instead
   (~4 DMAs/row for a table+accumulator RMW). Both routes project at or
   above XLA's ~70 ns/row scatter: this optimization is parked as
   NOT VIABLE with current Mosaic unless a batched-descriptor DMA
   primitive appears.

Usage: python scripts/row_pipeline_probe.py [N] [M]
"""

from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gather_kernel(idx_ref, row_blk, out_blk):
    out_blk[...] = row_blk[...]


def pl_gather(table, idx):
    m = idx.shape[0]
    c = table.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(m,),
        in_specs=[
            pl.BlockSpec((1, c), lambda i, idx_ref: (idx_ref[i], 0)),
        ],
        out_specs=pl.BlockSpec((1, c), lambda i, idx_ref: (i, 0)),
    )
    return pl.pallas_call(
        _gather_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, c), table.dtype),
    )(idx, table)


def _rmw_kernel(idx_ref, g_blk, row_blk, out_blk):
    out_blk[...] = row_blk[...] + g_blk[...]


def pl_rmw(table, idx, g):
    m = idx.shape[0]
    c = table.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(m,),
        in_specs=[
            pl.BlockSpec((1, c), lambda i, idx_ref: (i, 0)),          # g
            pl.BlockSpec((1, c), lambda i, idx_ref: (idx_ref[i], 0)),  # table row
        ],
        out_specs=pl.BlockSpec((1, c), lambda i, idx_ref: (idx_ref[i], 0)),
    )
    return pl.pallas_call(
        _rmw_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(table.shape, table.dtype),
        input_output_aliases={2: 0},  # table (after the prefetch arg) -> out
    )(idx, g, table)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    m = int(sys.argv[2]) if len(sys.argv) > 2 else 33024
    c = 128
    rng = np.random.default_rng(0)
    table = jnp.zeros((n, c), jnp.float32)
    idx = jnp.asarray(np.sort(rng.choice(n, m, replace=False)).astype(np.int32))
    g = jnp.asarray(rng.normal(size=(m, c)).astype(np.float32) * 1e-6)

    @jax.jit
    def run_xla_gather(table, idx, s):
        def body(i, acc):
            rows = jnp.take(table, idx + i * 0 + s, axis=0, mode="clip")
            return acc + rows.sum(0)
        return jax.lax.fori_loop(0, 10, body, jnp.zeros((c,)))

    @jax.jit
    def run_pl_gather(table, idx, s):
        def body(i, acc):
            rows = pl_gather(table, idx + i * 0 + s)
            return acc + rows.sum(0)
        return jax.lax.fori_loop(0, 10, body, jnp.zeros((c,)))

    @jax.jit
    def run_pl_rmw(table, idx, g, s):
        def body(i, tb):
            return pl_rmw(tb, idx + i * 0 + s, g)
        tb = jax.lax.fori_loop(0, 10, body, table)
        return tb[0].sum() + tb[12345].sum()

    @jax.jit
    def run_xla_scatter(table, idx, g, s):
        def body(i, tb):
            return tb.at[idx + i * 0 + s].add(g, mode="drop")
        tb = jax.lax.fori_loop(0, 10, body, table)
        return tb[0].sum() + tb[12345].sum()

    # warm (compile)
    z = jnp.int32(0)
    print("g0", float(run_xla_gather(table, idx, z)[0]), flush=True)
    print("g1", float(run_pl_gather(table, idx, z)[0]), flush=True)
    print("r0", float(run_xla_scatter(table, idx, g, z)), flush=True)
    print("r1", float(run_pl_rmw(table, idx, g, z)), flush=True)

    with jax.profiler.trace("/tmp/rowprobe_trace"):
        o = jnp.int32(1)
        float(run_xla_gather(table, idx, o)[0])
        float(run_pl_gather(table, idx, o)[0])
        float(run_xla_scatter(table, idx, g, o))
        float(run_pl_rmw(table, idx, g, o))
    print("traced", flush=True)


if __name__ == "__main__":
    main()
