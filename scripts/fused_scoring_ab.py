"""A/B the fused Pallas score-reduce kernels against the XLA formulations.

Measures, on the current backend (intended: one real v5e):

* streamed EXACT serving top-k (``recommend_batch``, batch 4096, k=10) with
  ``SBR_PALLAS_TOPK`` on vs off
* streamed MRR eval wall (512 users) with ``SBR_PALLAS_EVAL`` on vs off

at a 10M-item f32 catalog and a 20M-item bf16 catalog (dim=127 packs the
fused [N, D+1] row into exactly 128 lanes). Neither path depends on the
table's training state, so no fit is run. One JSON line per measurement.

Usage: python scripts/fused_scoring_ab.py [items10m items20m_bf16 ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def bench(num_items: int, name: str, dtype: str = "float32") -> None:
    import sbr_rs_tpu as sbr
    from sbr_rs_tpu.models import lstm
    from sbr_rs_tpu.models.base import ImplicitSequenceModel
    import sbr_rs_tpu.evaluation as evaluation

    model = (
        lstm.Hyperparameters(num_items, 32)
        .embedding_dim(127)
        .lstm_variant(lstm.LSTMVariant.NORMAL)
        .table_dtype(dtype)
        .from_seed(42)
        .build()
    )
    rng = np.random.default_rng(7)
    u = 4096
    histories = [
        rng.integers(0, num_items, rng.integers(2, 32)).tolist() for _ in range(u)
    ]
    test = sbr.datasets.synthetic_interactions(512, num_items, 20, rng=1).to_compressed()

    recs_by_flag = {}
    for flag in ("1", "0"):
        os.environ["SBR_PALLAS_TOPK"] = flag
        os.environ["SBR_PALLAS_EVAL"] = flag
        ImplicitSequenceModel._TOPK_FN_CACHE.clear()
        evaluation._make_catalog_counter.cache_clear()
        evaluation._make_catalog_counter_pallas.cache_clear()

        model.recommend_batch(histories, k=10)  # warm/compile
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            recs = model.recommend_batch(histories, k=10)
            best = min(best, time.perf_counter() - t0)
        assert len(recs) == u and len(set(recs[0])) == 10
        recs_by_flag[flag] = recs

        evaluation.mrr_score(model, test)  # warm/compile
        ev = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            mrr = evaluation.mrr_score(model, test)
            ev = min(ev, time.perf_counter() - t0)

        print(
            json.dumps(
                {
                    "config": name,
                    "fused_kernels": flag == "1",
                    "recommend_batch_users_per_sec": round(u / best, 1),
                    "mrr_eval_wall_s_512_users": round(ev, 3),
                    "mrr": round(float(mrr), 5),
                    "catalog_items": num_items,
                    "table_dtype": dtype,
                }
            ),
            flush=True,
        )

    # Fused vs XLA id-list parity (both are exact top-k over the same f32
    # scores; ulp-class ties at the k-th value may flip — report, don't
    # assert).
    same = sum(
        1 for a, b in zip(recs_by_flag["1"], recs_by_flag["0"]) if list(a) == list(b)
    )
    print(
        json.dumps({"config": name, "id_lists_equal": same, "of": u}), flush=True
    )


TARGETS = {
    "items10m": lambda: bench(10_000_000, "ab_10m_f32"),
    "items20m_bf16": lambda: bench(20_000_000, "ab_20m_bf16", dtype="bfloat16"),
}

if __name__ == "__main__":
    for t in sys.argv[1:] or ["items10m", "items20m_bf16"]:
        TARGETS[t]()
