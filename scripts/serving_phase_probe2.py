"""Decompose the WHOLE-TABLE streamed exact top-k (round-4+ single-pass
path: one pallas_call over the entire catalog emitting subgroup maxima,
wide merge on derived group maxima, subgroup refinement, slot-batched
phase-2 rescoring) at the serving bench shape (10M items f32, dim=127,
U=4096, k=10, sub=32).

Each variant is ONE jitted program; results feed a real numpy fetch so
XLA cannot elide work (block_until_ready alone can lie on this backend —
CLAUDE.md microbenchmark notes).

Usage: python scripts/serving_phase_probe2.py [num_items] [dtype]
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
    num_items = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    dtype = sys.argv[2] if len(sys.argv) > 2 else "float32"
    dim, u, k = 127, 4096, 10
    model = (
        lstm.Hyperparameters(num_items, 32)
        .embedding_dim(dim)
        .lstm_variant(lstm.LSTMVariant.NORMAL)
        .table_dtype(dtype)
        .from_seed(42)
        .build()
    )
    table = model._params["item_table"]
    rng = np.random.default_rng(7)
    reps = jnp.asarray(rng.normal(size=(u, dim)).astype(np.float32) * 0.1)
    reps_aug = jnp.concatenate([reps, jnp.ones((u, 1), jnp.float32)], axis=1)
    histories = [
        rng.integers(0, num_items, rng.integers(2, 32)).tolist() for _ in range(u)
    ]

    n = num_items
    group = ImplicitSequenceModel._GROUP_TARGET
    sub = ImplicitSequenceModel._SUBGROUP_TARGET
    r = group // sub
    s_width = 31
    kk = k + s_width

    def submax_gmax(table, reps_aug):
        # Mirror the SHIPPED single-pass path exactly (base.py): with
        # r > 1 the dual-output kernel emits subgroup AND group maxima
        # from the same in-register tile — deriving group maxima by
        # reshaping the stack outside the kernel materializes a
        # stack-sized relayout copy that OOMed 20M/U=4096 (advisor r4).
        if r > 1:
            allsub, gmax = ptk.score_submax_groupmax(
                table, reps_aug, 0, n, sub, group
            )
        else:
            allsub = ptk.score_groupmax(
                table, reps_aug, 0, n, sub
            )
            gmax = allsub
        return allsub, gmax

    @jax.jit
    def kernel_only(table, reps_aug):
        allsub, gmax = submax_gmax(table, reps_aug)
        # force materialization, tiny fetch
        return jnp.max(allsub, axis=0), jnp.max(gmax, axis=0)

    @jax.jit
    def through_merge(table, reps_aug):
        allsub, gmax = submax_gmax(table, reps_aug)
        allg = gmax.T  # [U, G]
        n_groups = allg.shape[1]
        w1 = min(kk, n_groups)
        _, gids = jax.lax.top_k(allg, w1)
        return gids

    @jax.jit
    def through_refine(table, reps_aug):
        allsub, gmax = submax_gmax(table, reps_aug)
        allg = gmax.T
        n_groups = allg.shape[1]
        w1 = min(kk, n_groups)
        _, gids = jax.lax.top_k(allg, w1)
        sids = (
            gids[:, :, None] * r + jnp.arange(r, dtype=gids.dtype)
        ).reshape(u, w1 * r)
        svals = jnp.take_along_axis(allsub, sids.T, axis=0).T
        _, sp = jax.lax.top_k(svals, min(kk, w1 * r))
        return jnp.take_along_axis(sids, sp, axis=1)

    def timeit(name, fn, *args):
        jax.tree_util.tree_map(np.asarray, fn(*args))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jax.tree_util.tree_map(np.asarray, fn(*args))
            best = min(best, time.perf_counter() - t0)
        print(json.dumps({"variant": name, "wall_s": round(best, 3)}), flush=True)
        return best

    t0v = timeit("kernel_only", kernel_only, table, reps_aug)
    t1 = timeit("through_merge", through_merge, table, reps_aug)
    t2 = timeit("through_refine", through_refine, table, reps_aug)

    model.recommend_batch(histories, k=k)  # warm full path
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        model.recommend_batch(histories, k=k)
        best = min(best, time.perf_counter() - t0)
    print(
        json.dumps({"variant": "full_recommend_batch", "wall_s": round(best, 3)}),
        flush=True,
    )
    print(
        json.dumps(
            {
                "kernel_s": round(t0v, 3),
                "merge_s": round(t1 - t0v, 3),
                "refine_s": round(t2 - t1, 3),
                "phase2_and_rest_s": round(best - t2, 3),
                "users_per_sec": round(u / best, 1),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
