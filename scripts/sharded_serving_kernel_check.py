"""Run the shard_map-composed fused serving/eval kernels on the REAL TPU
chip via a (data=1, model=1) mesh, at big-catalog scale.

The mesh composition of ``score_submax_groupmax`` / ``score_count_ge``
(``models/base.py topk_streamed_sharded``, ``evaluation.py
_make_catalog_counter_pallas(mesh=...)``) is parity-tested on CPU in
interpret mode only — with one real chip the benches never build a mesh,
so before this check the first multi-chip serving call would have been the
first time Mosaic compiled under shard_map on the serving path at all
(the round-3 lesson from the training tower, scripts/tpu_mesh_pallas_fit.py).
A single-device mesh compiles and runs that exact program shape on
hardware; mid-catalog slab masking (lo + c < n) is pinned by the CPU
interpret tests (tests/test_sharding.py, tests/test_pallas_topk.py).

Checks, at [num_items] (default 10M) f32 / dim 127 / U=4096 / k=10:
  1. sharded-kernel serving id-lists == unsharded-kernel id-lists
     (the round-4 on-chip exactness baseline) — and walls for both.
  2. sharded-kernel eval ranks == unsharded-kernel eval ranks at U=512.

Usage: python scripts/sharded_serving_kernel_check.py [num_items] [dtype]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

from sbr_rs_tpu import evaluation
from sbr_rs_tpu.models import lstm
from sbr_rs_tpu.models.base import ImplicitSequenceModel
from sbr_rs_tpu.parallel import make_mesh


def main() -> None:
    backend = jax.default_backend()
    if backend not in ("tpu", "axon"):
        print(f"SKIP: needs the TPU backend, got {backend!r}")
        return

    num_items = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    dtype = sys.argv[2] if len(sys.argv) > 2 else "float32"
    dim, u, k = 127, 4096, 10

    def build(mesh):
        hp = (
            lstm.Hyperparameters(num_items, 32)
            .embedding_dim(dim)
            .lstm_variant(lstm.LSTMVariant.NORMAL)
            .table_dtype(dtype)
            .from_seed(42)
        )
        if mesh is not None:
            hp = hp.mesh(mesh)
        return hp.build()

    rng = np.random.default_rng(7)
    histories = [
        rng.integers(0, num_items, rng.integers(2, 32)).tolist()
        for _ in range(u)
    ]

    def timed_lists(model, tag):
        t0 = time.perf_counter()
        lists = model.recommend_batch(histories, k=k)
        warm_build = time.perf_counter() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            lists = model.recommend_batch(histories, k=k)
            best = min(best, time.perf_counter() - t0)
        print(
            json.dumps(
                {
                    "step": tag,
                    "first_s": round(warm_build, 3),
                    "best_s": round(best, 3),
                    "users_per_sec": round(u / best, 1),
                }
            ),
            flush=True,
        )
        return lists

    single = build(None)
    lists_single = timed_lists(single, "serving_unsharded_kernel")

    mesh = make_mesh(data=1, model=1)
    sharded = build(mesh)
    # Same init (same seed): tables identical, so id-lists must agree
    # wherever scores are not exactly tied (the round-4 ulp class).
    lists_sharded = timed_lists(sharded, "serving_sharded_kernel_mesh11")

    same = sum(a == b for a, b in zip(lists_single, lists_sharded))
    print(
        json.dumps({"step": "serving_exactness", "same_lists": same, "of": u}),
        flush=True,
    )
    assert same >= u - 2, f"id-lists diverged: {same}/{u}"

    # Eval counter: compare fused sharded vs fused unsharded ranks.
    import sbr_rs_tpu as sbr

    ue = 512
    inter = sbr.data.Interactions(num_users=ue, num_items=num_items)
    for uu in range(ue):
        for t, it in enumerate(
            rng.integers(0, num_items, rng.integers(3, 16)).tolist()
        ):
            inter.push(uu, it, t)
    comp = inter.to_compressed()

    t0 = time.perf_counter()
    mrr_single = evaluation.mrr_score(single, comp)
    t_single = time.perf_counter() - t0
    t0 = time.perf_counter()
    mrr_sharded = evaluation.mrr_score(sharded, comp)
    t_sharded = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "step": "eval_fused",
                "mrr_unsharded": mrr_single,
                "mrr_sharded_mesh11": mrr_sharded,
                "wall_unsharded_s": round(t_single, 3),
                "wall_sharded_s": round(t_sharded, 3),
            }
        ),
        flush=True,
    )
    assert abs(mrr_single - mrr_sharded) < 1e-6, (mrr_single, mrr_sharded)
    print("OK: shard_map-composed serving/eval kernels ran on hardware")


if __name__ == "__main__":
    main()
