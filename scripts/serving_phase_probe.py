"""Decompose the streamed exact top-k's wall into phase-1 score+groupmax,
per-chunk top-k merges, and phase-2 rescoring, at the serving bench shape
(10M items f32, dim=127, U=4096, k=10).

Each variant is ONE jitted program over all chunks (the axon tunnel adds
~30 ms per dispatch). Variant results feed a real value fetch so XLA
cannot elide the work.

Usage: python scripts/serving_phase_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from sbr_rs_tpu.models import lstm
from sbr_rs_tpu.models.base import ImplicitSequenceModel
from sbr_rs_tpu.ops import pallas_topk as ptk


def main() -> None:
    num_items, dim, u, k = 10_000_000, 127, 4096, 10
    model = (
        lstm.Hyperparameters(num_items, 32)
        .embedding_dim(dim)
        .lstm_variant(lstm.LSTMVariant.NORMAL)
        .from_seed(42)
        .build()
    )
    table = model._params["item_table"]
    cc = table.shape[1]
    rng = np.random.default_rng(7)
    reps = jnp.asarray(rng.normal(size=(u, dim)).astype(np.float32) * 0.1)
    reps_aug = jnp.concatenate([reps, jnp.ones((u, 1), jnp.float32)], axis=1)
    histories = [
        rng.integers(0, num_items, rng.integers(2, 32)).tolist() for _ in range(u)
    ]

    chunk = ImplicitSequenceModel._SERVE_ITEM_CHUNK
    group = 128
    gpc = chunk // group
    n = num_items
    num_chunks = -(-n // chunk)
    s_width = 31
    kk = k + s_width

    @jax.jit
    def phase1_only(table, reps_aug):
        def body(carry, c):
            lo = c * chunk
            ids = lo + jnp.arange(chunk)
            tc = jnp.take(table, ids, axis=0, mode="clip")
            gmax = ptk.score_groupmax(tc, reps_aug, lo, n, group)  # [G, U]
            return jnp.maximum(carry, jnp.max(gmax, axis=0)), None

        out, _ = jax.lax.scan(
            body, jnp.full((u,), -jnp.inf), jnp.arange(num_chunks, dtype=jnp.int32)
        )
        return out

    @jax.jit
    def phase1_merge(table, reps_aug):
        def body(carry, c):
            vals, gids = carry
            lo = c * chunk
            ids = lo + jnp.arange(chunk)
            tc = jnp.take(table, ids, axis=0, mode="clip")
            gmax = ptk.score_groupmax(tc, reps_aug, lo, n, group).T  # [U, G]
            cv, cp = jax.lax.top_k(gmax, min(kk, gpc))
            cg = c * gpc + cp
            mv = jnp.concatenate([vals, cv], axis=1)
            mg = jnp.concatenate([gids, cg], axis=1)
            v, p = jax.lax.top_k(mv, kk)
            return (v, jnp.take_along_axis(mg, p, axis=1)), None

        total_groups = num_chunks * gpc
        init = (
            jnp.full((u, kk), -jnp.inf, jnp.float32),
            jnp.broadcast_to(total_groups + jnp.arange(kk, dtype=jnp.int32), (u, kk)),
        )
        (v, g), _ = jax.lax.scan(body, init, jnp.arange(num_chunks, dtype=jnp.int32))
        return v, g

    def timeit(name, fn, *args):
        # A REAL value fetch per run: on this backend block_until_ready can
        # return before the work is observable (CLAUDE.md microbenchmark
        # notes), so convert to numpy.
        jax.tree_util.tree_map(np.asarray, fn(*args))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jax.tree_util.tree_map(np.asarray, fn(*args))
            best = min(best, time.perf_counter() - t0)
        print(json.dumps({"variant": name, "wall_s": round(best, 3)}), flush=True)
        return best

    @jax.jit
    def phase1_bigtopk(table, reps_aug):
        # Alternative merge: stack every chunk's [G, U] maxima, ONE top-k
        # over all groups at the end (trades 77 merge passes for one wide
        # pass + a [U, G_all] materialization).
        def body(carry, c):
            lo = c * chunk
            ids = lo + jnp.arange(chunk)
            tc = jnp.take(table, ids, axis=0, mode="clip")
            gmax = ptk.score_groupmax(tc, reps_aug, lo, n, group)  # [G, U]
            return carry, gmax

        _, stacked = jax.lax.scan(
            body, 0, jnp.arange(num_chunks, dtype=jnp.int32)
        )  # [C_chunks, G, U]
        allg = stacked.reshape(num_chunks * gpc, u).T  # [U, G_all]
        v, g = jax.lax.top_k(allg, kk)
        return v, g

    def make_hybrid(m):
        # Merge every m chunks: [U, m*gpc] buffer (134 MB at m=8) instead
        # of the all-groups [U, G_all] (1.3 GB x2 at 10M).
        supers = -(-num_chunks // m)

        @jax.jit
        def phase1_hybrid(table, reps_aug):
            def body(carry, s):
                vals, gids = carry

                def inner(carry2, j):
                    c = s * m + j
                    lo = jnp.minimum(c, num_chunks - 1) * chunk
                    ids = lo + jnp.arange(chunk)
                    tc = jnp.take(table, ids, axis=0, mode="clip")
                    gmax = ptk.score_groupmax(tc, reps_aug, lo, n, group)
                    gmax = jnp.where(c < num_chunks, gmax, -jnp.inf)
                    return carry2, gmax

                _, stacked = jax.lax.scan(
                    inner, 0, jnp.arange(m, dtype=jnp.int32)
                )  # [m, G, U]
                block = stacked.reshape(m * gpc, u).T  # [U, m*gpc]
                cv, cp = jax.lax.top_k(block, min(kk, m * gpc))
                cg = s * (m * gpc) + cp
                mv = jnp.concatenate([vals, cv], axis=1)
                mg = jnp.concatenate([gids, cg], axis=1)
                v, p = jax.lax.top_k(mv, kk)
                return (v, jnp.take_along_axis(mg, p, axis=1)), None

            total_groups = num_chunks * gpc
            init = (
                jnp.full((u, kk), -jnp.inf, jnp.float32),
                jnp.broadcast_to(
                    supers * m * gpc + jnp.arange(kk, dtype=jnp.int32), (u, kk)
                ),
            )
            (v, g), _ = jax.lax.scan(body, init, jnp.arange(supers, dtype=jnp.int32))
            return v, g

        return phase1_hybrid

    t1 = timeit("phase1_kernel_only", phase1_only, table, reps_aug)
    t2 = timeit("phase1_plus_merges", phase1_merge, table, reps_aug)
    timeit("phase1_bigtopk", phase1_bigtopk, table, reps_aug)
    timeit("phase1_hybrid_m8", make_hybrid(8), table, reps_aug)
    timeit("phase1_hybrid_m16", make_hybrid(16), table, reps_aug)

    model.recommend_batch(histories, k=k)  # warm full path
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        model.recommend_batch(histories, k=k)
        best = min(best, time.perf_counter() - t0)
    print(json.dumps({"variant": "full_recommend_batch", "wall_s": round(best, 3)}), flush=True)
    print(
        json.dumps(
            {
                "phase1_s": round(t1, 3),
                "merge_s": round(t2 - t1, 3),
                "phase2_and_rest_s": round(best - t2, 3),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
