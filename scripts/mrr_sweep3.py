"""Third sweep: lstm_warp only, with per-gate Glorot init."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import sbr_rs_tpu as sbr
from scripts.mrr_check import run


def main():
    data = sbr.datasets.download_movielens_100k()
    rng = np.random.default_rng(42)
    train, test = sbr.data.user_based_split(data, rng, 0.2)
    train_mat = train.to_compressed()
    test_mat = test.to_compressed()

    grid = [(32, 0.16, 10), (16, 0.2, 10), (32, 0.2, 10), (24, 0.16, 10), (32, 0.12, 10), (48, 0.16, 10)]
    for batch, lr, epochs in grid:
        os.environ["SBR_CHECK_BATCH"] = str(batch)
        os.environ["SBR_CHECK_LR"] = str(lr)
        os.environ["SBR_CHECK_EPOCHS"] = str(epochs)
        print(f"--- batch={batch} lr={lr} epochs={epochs}", flush=True)
        run("lstm_warp", train_mat, test_mat, data.num_items)


if __name__ == "__main__":
    main()
