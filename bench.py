"""Benchmark: training throughput (examples/s/chip) on Movielens 100K.

Config mirrors the reference's README headline ("fit LSTM on ML-100K in
~10s": dim=32, max_seq_len=32, WARP, Adagrad, lr=0.16, l2=4e-4, 10 epochs —
`readme.md:26-48`). An "example" is one supervised timestep, matching the
reference's accounting (`src/models/sequence_model.rs:158`).

Baseline: the reference trains `num_examples * 10 epochs` timesteps in
~10 s of single-core CPU — `vs_baseline` is our examples/s over that rate.

Prints ONE JSON line on stdout; details go to stderr.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def _wait_for_backend(deadline_s: float = 600.0):
    """Return jax.devices()[0], retrying while the tunneled TPU backend
    reports UNAVAILABLE.

    The axon tunnel occasionally drops for minutes at a time; a bench run
    that happens to start inside an outage should wait it out (bounded)
    rather than record a failure. Each failed init attempt can itself block
    for ~10+ minutes inside the plugin, so the deadline is checked between
    attempts, not enforced within one.
    """
    import jax

    t0 = time.monotonic()
    while True:
        try:
            return jax.devices()[0]
        except RuntimeError as e:
            if time.monotonic() - t0 > deadline_s:
                raise
            print(f"backend unavailable, retrying: {e}", file=sys.stderr)
            # jax caches the failed-backend state; clear it so the next
            # attempt re-initializes the plugin.
            try:
                import jax.extend

                jax.extend.backend.clear_backends()
            except Exception:
                pass
            time.sleep(20.0)


def main() -> None:
    import sbr_rs_tpu as sbr

    device = _wait_for_backend()
    print(f"bench device: {device}", file=sys.stderr)

    data = sbr.datasets.download_movielens_100k()
    rng = np.random.default_rng(42)
    train, test = sbr.data.user_based_split(data, rng, 0.2)
    train_mat = train.to_compressed()

    import os

    max_seq_len = 32
    # 40 epochs per timed fit: the tunneled-TPU backend adds ~30 ms of
    # fixed per-call overhead (pre/post-roll around one device execution —
    # an artifact of the axon tunnel, not chip time; device time is
    # ~4.2 ms/epoch). A longer fit measures the SUSTAINED training rate;
    # per-epoch device time is identical at 10 or 40 epochs
    # (ARCHITECTURE.md "Dispatch overhead"). SBR_BENCH_EPOCHS=10 reproduces
    # the reference README's exact workload.
    epochs = int(os.environ.get("SBR_BENCH_EPOCHS", "40"))
    batch_size = int(os.environ.get("SBR_BENCH_BATCH", "256"))
    packed = os.environ.get("SBR_BENCH_PACKED", "1") not in ("0", "false", "off")

    def build():
        return (
            sbr.models.lstm.Hyperparameters(data.num_items, max_seq_len)
            .embedding_dim(32)
            .learning_rate(0.16)
            .l2_penalty(0.0004)
            .lstm_variant(sbr.models.lstm.LSTMVariant.NORMAL)
            .loss(sbr.models.Loss.WARP)
            .optimizer(sbr.models.Optimizer.ADAGRAD)
            .num_epochs(epochs)
            .batch_size(batch_size)
            .packed(packed)
            .from_seed(42)
            .build()
        )

    # Warm-up fit compiles the whole-training program; the timed fits reuse
    # it (fit resets optimizer state each call, matching the reference's
    # optimizer-per-fit semantics, so every fit is the same workload).
    # Best-of-3 timing: the tunneled-TPU dispatch adds ±10% run-to-run noise.
    model = build()
    model.fit(train_mat)
    examples_per_epoch = model.history.examples_per_epoch

    elapsed = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        loss = model.fit(train_mat)
        elapsed = min(elapsed, time.perf_counter() - t0)

    total_examples = examples_per_epoch * epochs
    examples_per_sec = total_examples / elapsed

    # Reference baseline RATE: its README workload is 10 epochs over the
    # training set in ~10 s (readme.md:26-27) -> examples_per_epoch * 10
    # supervised timesteps per 10 s, independent of how many epochs WE
    # time per fit.
    baseline_examples_per_sec = examples_per_epoch * 10 / 10.0
    vs_baseline = examples_per_sec / baseline_examples_per_sec

    print(
        f"fit: {elapsed:.2f}s for {total_examples} examples "
        f"({examples_per_sec:,.0f} ex/s), loss={loss:.4f}",
        file=sys.stderr,
    )

    print(
        json.dumps(
            {
                "metric": "train_examples_per_sec_per_chip",
                "value": round(examples_per_sec, 1),
                "unit": "examples/s (supervised timesteps/s), LSTM-32 WARP ML-100K",
                "vs_baseline": round(vs_baseline, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
