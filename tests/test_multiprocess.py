"""REAL multi-process training: two `jax.distributed` processes (gloo CPU
collectives, 4 virtual devices each) form one 8-device global mesh and must
reproduce the single-process 8-device fit trajectory.

This exercises what tests/test_sharding.py cannot: cross-process
`jax.distributed.initialize`, global-array construction from per-process
shards, and collectives that actually cross a process boundary. The
reference's only real-concurrency test is the 2-thread fit of
``src/models/lstm.rs:474-496``.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

SCRIPT = os.path.join(os.path.dirname(__file__), "..", "scripts", "multiprocess_fit.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run(num_processes: int, timeout: float = 600.0, model_axis: int = 1) -> dict:
    port = _free_port()
    env = {
        k: v
        for k, v in os.environ.items()
        # the subprocess picks its own platform/device-count flags
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "SBR_TEST_PLATFORM")
    }
    procs = [
        subprocess.Popen(
            [
                sys.executable, SCRIPT, str(num_processes), str(i), str(port),
                str(model_axis),
            ],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            env=env,
            text=True,
        )
        for i in range(num_processes)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=timeout)
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, f"worker failed (rc={rc}):\n{err[-3000:]}"
    # process 0 prints the JSON line
    line = [l for l in outs[0][1].splitlines() if l.startswith("{")][-1]
    return json.loads(line)


@pytest.mark.slow
def test_two_process_fit_matches_single_process():
    single = _run(1)
    multi = _run(2)
    assert multi["global_devices"] == 8
    assert single["global_devices"] == 8
    np.testing.assert_allclose(
        multi["epoch_losses"], single["epoch_losses"], rtol=1e-4,
        err_msg="2-process sharded fit diverged from single-process trajectory",
    )


@pytest.mark.slow
def test_two_process_row_sharded_table():
    """BASELINE config[4]'s program shape: the item table row-sharded over
    the model axis ACROSS the process boundary (WARP gathers/scatters and
    loss reductions cross processes via gloo collectives), asserted against
    the single-process trajectory on the same (data=4, model=2) mesh."""
    single = _run(1, model_axis=2)
    multi = _run(2, model_axis=2)
    assert multi["model_axis"] == 2
    np.testing.assert_allclose(
        multi["epoch_losses"], single["epoch_losses"], rtol=1e-4,
        err_msg="2-process row-sharded fit diverged from single-process",
    )


@pytest.mark.slow
def test_two_process_serving_and_eval():
    """SERVING and EVAL across the process boundary (round 5): inputs
    upload as fully-replicated global arrays (the window-store pattern)
    and outputs are pinned replicated, so recommend_batch / mrr_score
    run under a multi-controller mesh — lists and MRR must match the
    single-process run on the same (data=4, model=2) sharded table."""
    single = _run(1, model_axis=2)
    multi = _run(2, model_axis=2)
    assert multi["recommend_lists"] == single["recommend_lists"], (
        multi["recommend_lists"], single["recommend_lists"],
    )
    np.testing.assert_allclose(multi["mrr"], single["mrr"], rtol=1e-6)
