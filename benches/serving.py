"""Serving-path benchmarks: encode, batched top-k, single-query latency.

The reference's serving path builds a fresh autodiff graph per request and
scores the catalog one SIMD dot at a time (``src/models/sequence_model.rs:
180-233``); here encoding is one batched tower program and ranking is a
catalog matmul + device top-k. Measures on an ML-100K-trained LSTM-32:

* batched user encoding (users/s, batch 4096)
* batched recommend: encode + full-catalog score + seen-mask + top-10,
  end to end (users/s, batch 4096)
* single-user recommend latency (median; dominated by the tunnel RTT on
  this backend)
* warm full-catalog MRR evaluation wall

Usage: python benches/serving.py
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import sbr_rs_tpu as sbr
from sbr_rs_tpu.models import Loss, Optimizer, lstm


def main() -> None:
    data = sbr.datasets.download_movielens_100k()
    rng = np.random.default_rng(42)
    train, test = sbr.data.user_based_split(data, rng, 0.2)
    train_mat = train.to_compressed()
    test_mat = test.to_compressed()

    model = (
        lstm.Hyperparameters(data.num_items, 32)
        .embedding_dim(32)
        .learning_rate(0.16)
        .l2_penalty(0.0004)
        .lstm_variant(lstm.LSTMVariant.NORMAL)
        .loss(Loss.WARP)
        .optimizer(Optimizer.ADAGRAD)
        .num_epochs(10)
        .batch_size(256)
        .packed(True)
        .from_seed(42)
        .build()
    )
    model.fit(train_mat)

    u = 4096
    histories = [
        rng.integers(0, data.num_items, rng.integers(2, 32)).tolist()
        for _ in range(u)
    ]

    def best_of(fn, n=3):
        best = float("inf")
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return best

    model.user_representations(histories)  # warm/compile
    t = best_of(lambda: model.user_representations(histories))
    encode_ups = u / t

    model.recommend_batch(histories, k=10)  # warm/compile
    t = best_of(lambda: model.recommend_batch(histories, k=10))
    recommend_ups = u / t

    model.recommend(histories[0], k=10)  # warm
    lat = [best_of(lambda: model.recommend(histories[0], k=10), n=1) for _ in range(30)]
    single_ms = statistics.median(lat) * 1e3

    sbr.evaluation.mrr_score(model, test_mat)  # warm
    eval_s = best_of(lambda: sbr.evaluation.mrr_score(model, test_mat))

    print(
        json.dumps(
            {
                "encode_users_per_sec": round(encode_ups),
                "recommend_batch_users_per_sec": round(recommend_ups),
                "recommend_single_ms_median": round(single_ms, 2),
                "mrr_eval_warm_s": round(eval_s, 3),
                "catalog_items": data.num_items,
            }
        )
    )


if __name__ == "__main__":
    main()
