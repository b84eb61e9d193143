"""Tune the GRU family's ML-100K config for its extension quality bar.

The GRU family has no reference counterpart (like attention), so the bar
asserted in ``tests/test_integration_ml100k.py`` is this repo's own, set
from this study. The search is compile-aware: program shape =
(batch, epochs, schedule, optimizer) — lr/l2/seed trials reuse one
compiled whole-fit program (lr/l2 enter as traced scalars).

Stage A screens an lr x l2 grid per shape at seed 42; stage B runs the
top configs at all three gate seeds (42, 123, 7). Results append to
``gru_tune.json`` sorted by worst-seed MRR.

Usage: python scripts/gru_tune.py [--fast]
"""

from __future__ import annotations

import argparse
import itertools
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import sbr_rs_tpu as sbr
from sbr_rs_tpu.models import Loss, Optimizer, gru

GATE_SEEDS = (42, 123, 7)

SHAPES = [
    # (batch, epochs, schedule, optimizer)
    (16, 40, "cosine", Optimizer.ADAGRAD),
    (16, 40, "constant", Optimizer.ADAGRAD),
    (16, 40, "cosine", Optimizer.ADAM),
]
LRS = {Optimizer.ADAGRAD: (0.08, 0.13, 0.2), Optimizer.ADAM: (0.003, 0.01, 0.03)}
L2S = (0.004, 0.013, 0.03)


def fit_and_score(data, train_mat, test_mat, shape, lr, l2, seed):
    batch, epochs, schedule, opt = shape
    model = (
        gru.Hyperparameters(data.num_items, 128)
        .embedding_dim(32)
        .learning_rate(lr)
        .l2_penalty(l2)
        .loss(Loss.WARP)
        .optimizer(opt)
        .num_epochs(epochs)
        .batch_size(batch)
        .lr_schedule(schedule)
        .from_seed(seed)
        .build()
    )
    model.fit(train_mat)
    return sbr.evaluation.mrr_score(model, test_mat)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--fast", action="store_true", help="first shape only")
    args = ap.parse_args()

    data = sbr.datasets.download_movielens_100k()
    rng = np.random.default_rng(42)
    train, test = sbr.data.user_based_split(data, rng, 0.2)
    train_mat, test_mat = train.to_compressed(), test.to_compressed()

    shapes = SHAPES[:1] if args.fast else SHAPES
    trials = []
    for shape in shapes:
        for lr, l2 in itertools.product(LRS[shape[3]], L2S):
            t0 = time.time()
            mrr = fit_and_score(data, train_mat, test_mat, shape, lr, l2, 42)
            rec = {
                "batch": shape[0], "epochs": shape[1], "schedule": shape[2],
                "optimizer": shape[3].value, "lr": lr, "l2": l2,
                "mrr_s42": round(float(mrr), 5), "wall_s": round(time.time() - t0, 1),
            }
            trials.append(rec)
            print(json.dumps(rec), flush=True)

    trials.sort(key=lambda r: -r["mrr_s42"])
    for rec in trials[:3]:
        shape = (
            rec["batch"], rec["epochs"], rec["schedule"],
            Optimizer(rec["optimizer"]),
        )
        mrrs = {42: rec["mrr_s42"]}
        for seed in GATE_SEEDS[1:]:
            mrrs[seed] = round(
                float(fit_and_score(data, train_mat, test_mat, shape, rec["lr"], rec["l2"], seed)), 5
            )
        rec["mrrs"] = mrrs
        rec["worst"] = min(mrrs.values())
        print(json.dumps(rec), flush=True)

    out = Path(__file__).resolve().parent.parent / "gru_tune.json"
    existing = json.loads(out.read_text()) if out.exists() else []
    existing.extend(trials)
    existing.sort(key=lambda r: -(r.get("worst") or r.get("mrr_s42") or 0))
    out.write_text(json.dumps(existing, indent=1))
    print(f"wrote {out} ({len(existing)} trials)")


if __name__ == "__main__":
    main()
