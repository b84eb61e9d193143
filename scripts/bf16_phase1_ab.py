"""A/B the opt-in bf16 phase-1 scoring on the real chip.

phase1_precision="bfloat16" rounds the phase-1 selection matmul's
operands to bf16 (f32 accumulation; phase 2 re-scores survivors in f32),
trading selection recall for the MXU's bf16 rate. This measures, at the
serving bench shape (U=4096, k=10, dim 127):

* exact-f32 vs bf16-phase1 recommend_batch wall;
* recall@10 of the bf16 lists against the exact lists.

Usage: python scripts/bf16_phase1_ab.py [num_items] [dtype]
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


def main() -> None:
    if jax.default_backend() not in ("tpu", "axon"):
        print(f"SKIP: needs the TPU backend, got {jax.default_backend()!r}")
        return
    num_items = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    dtype = sys.argv[2] if len(sys.argv) > 2 else "float32"
    u, k = 4096, 10
    model = (
        lstm.Hyperparameters(num_items, 32)
        .embedding_dim(127)
        .lstm_variant(lstm.LSTMVariant.NORMAL)
        .table_dtype(dtype)
        .from_seed(42)
        .build()
    )
    rng = np.random.default_rng(7)
    histories = [
        rng.integers(0, num_items, rng.integers(2, 32)).tolist()
        for _ in range(u)
    ]

    def wall(**kw):
        model.recommend_batch(histories, k=k, **kw)
        best, lists = float("inf"), None
        for _ in range(3):
            t0 = time.perf_counter()
            lists = model.recommend_batch(histories, k=k, **kw)
            best = min(best, time.perf_counter() - t0)
        return best, lists

    t32, exact = wall()
    tbf, fast = wall(phase1_precision="bfloat16")
    inter = sum(len(set(a) & set(b)) for a, b in zip(exact, fast))
    print(
        json.dumps(
            {
                "num_items": num_items,
                "table_dtype": dtype,
                "exact_f32_users_per_sec": round(u / t32, 1),
                "bf16_phase1_users_per_sec": round(u / tbf, 1),
                "speedup": round(t32 / tbf, 3),
                "recall_at_10_vs_exact": round(inter / (u * k), 5),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
