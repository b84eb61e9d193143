"""Sweep the streamed-serving and streamed-eval chunk sizes under the fused
Pallas kernels.

With the XLA formulations the chunk size traded score-matrix HBM footprint
against merge frequency; the fused kernels removed the score matrix, so
larger chunks now only reduce per-chunk costs (top-k merges, slice copies,
loop plumbing). This measures where the knee is (one v5e, 10M-item f32
catalog, dim=127).

Usage: python scripts/fused_chunk_sweep.py [serve_chunks...] (powers of 2)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main() -> None:
    import sbr_rs_tpu as sbr
    from sbr_rs_tpu.models import lstm
    from sbr_rs_tpu.models.base import ImplicitSequenceModel
    import sbr_rs_tpu.evaluation as evaluation

    num_items = 10_000_000
    model = (
        lstm.Hyperparameters(num_items, 32)
        .embedding_dim(127)
        .lstm_variant(lstm.LSTMVariant.NORMAL)
        .from_seed(42)
        .build()
    )
    rng = np.random.default_rng(7)
    u = 4096
    histories = [
        rng.integers(0, num_items, rng.integers(2, 32)).tolist() for _ in range(u)
    ]
    test = sbr.datasets.synthetic_interactions(512, num_items, 20, rng=1).to_compressed()

    serve_chunks = [int(x) for x in sys.argv[1:]] or [131072, 262144, 524288]
    for sc in serve_chunks:
        ImplicitSequenceModel._SERVE_ITEM_CHUNK = sc
        ImplicitSequenceModel._TOPK_FN_CACHE.clear()
        evaluation._ITEM_CHUNK = sc // 2  # eval used chunk = serve/2 historically
        evaluation._make_catalog_counter_pallas.cache_clear()

        model.recommend_batch(histories, k=10)  # warm/compile
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            model.recommend_batch(histories, k=10)
            best = min(best, time.perf_counter() - t0)

        evaluation.mrr_score(model, test)  # warm/compile
        ev = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            evaluation.mrr_score(model, test)
            ev = min(ev, time.perf_counter() - t0)

        print(
            json.dumps(
                {
                    "serve_chunk": sc,
                    "eval_chunk": sc // 2,
                    "recommend_batch_users_per_sec": round(u / best, 1),
                    "mrr_eval_wall_s_512_users": round(ev, 3),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
