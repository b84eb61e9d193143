"""Quick quality gate: train the four reference configs on ML-100K and
print test MRR vs the reference thresholds (BASELINE.md).

Usage: python scripts/mrr_check.py [config ...]
Configs: lstm_hinge lstm_warp ewma_hinge ewma_warp (default: all)
Env: SBR_CHECK_BATCH (default 64), SBR_CHECK_LR (default 0.16)
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

# Per-config tuned (batch, lr, l2, epochs, schedule) — the single source of
# truth lives in tests/test_integration_ml100k.py (CONFIGS); env vars
# override for sweeps. See PARITY.md "Quality-gate robustness".
_TUNED = {
    "lstm_hinge": (16, 0.13, 0.013, 40, "constant"),
    "lstm_warp": (1, 0.16, 0.01, 40, "cosine"),
    "ewma_hinge": (2, 0.2, 0.004, 40, "cosine"),
    "ewma_warp": (16, 0.14, 0.006, 40, "cosine"),
}


def run(name: str, train_mat, test_mat, num_items: int) -> float:
    tuned_batch, tuned_lr, tuned_l2, tuned_epochs, tuned_sched = _TUNED[name]
    batch = int(os.environ.get("SBR_CHECK_BATCH", tuned_batch))
    lr = float(os.environ.get("SBR_CHECK_LR", tuned_lr))
    l2 = float(os.environ.get("SBR_CHECK_L2", tuned_l2))
    epochs = int(os.environ.get("SBR_CHECK_EPOCHS", tuned_epochs))
    sched = os.environ.get("SBR_CHECK_SCHED", tuned_sched)
    family, loss_name = name.split("_")
    loss = Loss.WARP if loss_name == "warp" else Loss.HINGE
    if family == "lstm":
        hp = (
            lstm.Hyperparameters(num_items, 128)
            .lstm_variant(lstm.LSTMVariant.NORMAL)
        )
    else:
        hp = ewma.Hyperparameters(num_items, 128)
    hp = (
        hp.embedding_dim(32)
        .learning_rate(lr)
        .l2_penalty(l2)
        .loss(loss)
        .optimizer(Optimizer.ADAGRAD)
        .num_epochs(epochs)
        .batch_size(batch)
        .lr_schedule(sched)
        .from_seed(42)
    )
    model = hp.build()
    t0 = time.perf_counter()
    fit_loss = model.fit(train_mat)
    fit_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    mrr = sbr.evaluation.mrr_score(model, test_mat)
    eval_s = time.perf_counter() - t0
    train_mrr = sbr.evaluation.mrr_score(model, train_mat)
    bar = BARS[name]
    status = "PASS" if mrr > bar else "FAIL"
    print(
        f"{name:12s} loss={fit_loss:.4f} test_mrr={mrr:.4f} train_mrr={train_mrr:.4f} "
        f"bar={bar} [{status}] fit={fit_s:.1f}s eval={eval_s:.1f}s",
        flush=True,
    )
    return mrr


def main():
    configs = sys.argv[1:] or list(BARS)
    data = sbr.datasets.download_movielens_100k()
    rng = np.random.default_rng(42)
    train, test = sbr.data.user_based_split(data, rng, 0.2)
    train_mat = train.to_compressed()
    test_mat = test.to_compressed()
    print(f"train={len(train_mat)} test={len(test_mat)} items={data.num_items}", flush=True)
    for name in configs:
        run(name, train_mat, test_mat, data.num_items)


if __name__ == "__main__":
    main()
