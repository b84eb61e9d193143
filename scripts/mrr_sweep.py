"""Batch/lr tuning sweep against the reference MRR bars.

Batched synchronous training needs different (batch, lr) than the
reference's per-sequence SGD (SURVEY.md §7 hard part #2); this drives the
retune. Winning configs live in tests/test_integration_ml100k.py.

Usage::

    python scripts/mrr_sweep.py CONFIG[,CONFIG...] "BATCH:LR[:EPOCHS]" ...
    python scripts/mrr_sweep.py lstm_warp 32:0.12 16:0.2 32:0.16:20
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import sbr_rs_tpu as sbr
from scripts.mrr_check import BARS, run


def main():
    configs = sys.argv[1].split(",") if len(sys.argv) > 1 else list(BARS)
    points = sys.argv[2:] or ["16:0.16", "32:0.16", "16:0.2", "32:0.12"]

    data = sbr.datasets.download_movielens_100k()
    rng = np.random.default_rng(42)
    train, test = sbr.data.user_based_split(data, rng, 0.2)
    train_mat = train.to_compressed()
    test_mat = test.to_compressed()

    for point in points:
        parts = point.split(":")
        batch, lr = int(parts[0]), float(parts[1])
        epochs = int(parts[2]) if len(parts) > 2 else 10
        os.environ["SBR_CHECK_BATCH"] = str(batch)
        os.environ["SBR_CHECK_LR"] = str(lr)
        os.environ["SBR_CHECK_EPOCHS"] = str(epochs)
        print(f"--- batch={batch} lr={lr} epochs={epochs}", flush=True)
        for name in configs:
            run(name, train_mat, test_mat, data.num_items)


if __name__ == "__main__":
    main()
