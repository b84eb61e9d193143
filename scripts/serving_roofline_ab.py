"""Serving roofline evidence: phase bounds + the last parked levers.

VERDICT r4 item 4: state the phase-level bound for exact streamed serving
and A/B the parked levers (group 64; bf16 rows halving phase-2 gathered
bytes at fixed row count). This script measures, at the serving bench
shape (U=4096, k=10, dim 127):

1. full recommend_batch wall for (group, sub) in {(128,32) shipped,
   (64,32), (128,16), (64,16)} at [num_items] f32 — id-lists verified
   against the shipped config;
2. the same shape with a bf16 table — phase 2 gathers HALF the bytes per
   row at the SAME row count, so equal walls mean phase 2 is
   gather-LATENCY bound (the bf16-gather lever is dead) while a ~2x gap
   means it is bandwidth bound (lever viable);
3. the phase decomposition for the shipped config
   (kernel / merge / refine / phase2, serving_phase_probe2-style).

Roofline inputs (v5e): HBM ~819 GB/s, measured large-table random-row
gather ~8 ns/row (ARCHITECTURE.md), phase-1 MXU contraction
2*N*(D+1)*U FLOPs.

Usage: python scripts/serving_roofline_ab.py [num_items]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

from sbr_rs_tpu.models import lstm
from sbr_rs_tpu.models.base import ImplicitSequenceModel


def build(num_items, dtype):
    return (
        lstm.Hyperparameters(num_items, 32)
        .embedding_dim(127)
        .lstm_variant(lstm.LSTMVariant.NORMAL)
        .table_dtype(dtype)
        .from_seed(42)
        .build()
    )


def main() -> None:
    backend = jax.default_backend()
    if backend not in ("tpu", "axon"):
        print(f"SKIP: needs the TPU backend, got {backend!r}")
        return
    num_items = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    u, k = 4096, 10
    rng = np.random.default_rng(7)
    histories = [
        rng.integers(0, num_items, rng.integers(2, 32)).tolist()
        for _ in range(u)
    ]

    def wall(model):
        model.recommend_batch(histories, k=k)  # compile+warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            lists = model.recommend_batch(histories, k=k)
            best = min(best, time.perf_counter() - t0)
        return best, lists

    results = []
    model_f32 = build(num_items, "float32")
    baseline_lists = None
    for group, sub in ((128, 32), (64, 32), (128, 16), (64, 16)):
        os.environ["SBR_SERVE_GROUP"] = str(group)
        os.environ["SBR_SERVE_SUBGROUP"] = str(sub)
        ImplicitSequenceModel._TOPK_FN_CACHE.clear()
        t, lists = wall(model_f32)
        same = (
            None if baseline_lists is None
            else sum(a == b for a, b in zip(baseline_lists, lists))
        )
        if baseline_lists is None:
            baseline_lists = lists
        row = {
            "step": "group_sub_ab", "group": group, "sub": sub,
            "dtype": "float32", "best_s": round(t, 3),
            "users_per_sec": round(u / t, 1), "same_lists_vs_shipped": same,
        }
        print(json.dumps(row), flush=True)
        results.append(row)
    os.environ.pop("SBR_SERVE_GROUP", None)
    os.environ.pop("SBR_SERVE_SUBGROUP", None)
    ImplicitSequenceModel._TOPK_FN_CACHE.clear()
    del model_f32

    # bf16 at the SAME catalog: phase-2 row count identical, bytes halved.
    model_bf16 = build(num_items, "bfloat16")
    t, _ = wall(model_bf16)
    row = {
        "step": "bf16_same_shape", "dtype": "bfloat16",
        "best_s": round(t, 3), "users_per_sec": round(u / t, 1),
    }
    print(json.dumps(row), flush=True)
    results.append(row)

    # Roofline numbers for the shipped config.
    d_bytes = 4 * 128
    kk = k + 31  # default max history 31 -> seen width
    flops = 2.0 * num_items * 128 * u
    stream_s = num_items * d_bytes / 819e9
    p2_rows = kk * 32 * u
    p2_latency_s = p2_rows * 8e-9
    p2_bytes_s = p2_rows * d_bytes / 819e9
    print(
        json.dumps(
            {
                "step": "roofline_inputs",
                "phase1_flops": flops,
                "phase1_stream_floor_s": round(stream_s, 4),
                "phase2_rows": p2_rows,
                "phase2_latency_floor_s": round(p2_latency_s, 4),
                "phase2_bandwidth_floor_s": round(p2_bytes_s, 4),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
