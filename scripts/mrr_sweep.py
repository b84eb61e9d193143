"""Batch/lr retuning sweep for the reference MRR bars (SURVEY.md §7 hard
part #2: batched synchronous steps need different lr/batch than the
reference's per-sequence SGD)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import sbr_rs_tpu as sbr
from scripts.mrr_check import BARS, run


def main():
    configs = sys.argv[1:] or ["lstm_warp", "ewma_hinge", "ewma_warp"]
    data = sbr.datasets.download_movielens_100k()
    rng = np.random.default_rng(42)
    train, test = sbr.data.user_based_split(data, rng, 0.2)
    train_mat = train.to_compressed()
    test_mat = test.to_compressed()

    grid = [(16, 0.16), (32, 0.16), (64, 0.32), (32, 0.32), (16, 0.08), (128, 0.5)]
    for batch, lr in grid:
        os.environ["SBR_CHECK_BATCH"] = str(batch)
        os.environ["SBR_CHECK_LR"] = str(lr)
        print(f"--- batch={batch} lr={lr}", flush=True)
        for name in configs:
            run(name, train_mat, test_mat, data.num_items)


if __name__ == "__main__":
    main()
