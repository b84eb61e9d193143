"""Count the collectives in the compiled sharded fit program.

VERDICT r4 item 3: the multi-host scaling story needs an ACCOUNTING, not
one wall-clock ratio — per-step collective counts and bytes demonstrate
that the sharded whole-fit program's cross-device communication is a few
small psums/gathers per step (DCN-friendly at real multi-host scale)
rather than per-batch host round-trips.

Method: run a small sharded fit in a subprocess with
``--xla_dump_to``, parse the ``jit_fit_fn`` module's
``after_optimizations`` HLO, and report every collective instruction
(opcode, operand shape, bytes) classified by whether it executes inside
the step/epoch while-loops (per-iteration) or once per fit dispatch.
The op_name metadata carries the loop nesting (``jit(fit_fn)/while/...``).

Usage:
    python scripts/collective_census.py              # census both mesh shapes
    python scripts/collective_census.py _run D M     # internal: dump one fit
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

_COLLECTIVES = (
    "all-reduce",
    "all-gather",
    "reduce-scatter",
    "collective-permute",
    "all-to-all",
)

_DTYPE_BYTES = {"f32": 4, "s32": 4, "u32": 4, "bf16": 2, "f16": 2, "pred": 1,
                "s64": 8, "u64": 8, "f64": 8, "s8": 1, "u8": 1}


def _run_fit(data_axis: int, model_axis: int, dump_dir: str) -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={data_axis * model_axis} "
        f"--xla_dump_to={dump_dir}"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from sbr_rs_tpu.data import Interactions
    from sbr_rs_tpu.models import Loss, Optimizer, lstm
    from sbr_rs_tpu.parallel import make_mesh

    rng = np.random.default_rng(0)
    nu, ni, sl = 64, 128, 12
    inter = Interactions.from_arrays(
        np.repeat(np.arange(nu), sl),
        rng.integers(0, ni, nu * sl),
        np.tile(np.arange(sl), nu),
        nu,
        ni,
    ).to_compressed()
    mesh = make_mesh(data=data_axis, model=model_axis)
    m = (
        lstm.Hyperparameters(ni, 8)
        .embedding_dim(16)
        .learning_rate(0.1)
        .loss(Loss.WARP)
        .optimizer(Optimizer.ADAGRAD)
        .num_epochs(3)
        .batch_size(16)
        .from_seed(42)
        .mesh(mesh)
        .build()
    )
    m.fit(inter)


_INSTR_RE = re.compile(
    r"%\S+ = \(?([a-z0-9]+)\[([0-9,]*)\][^ ]* ("
    + "|".join(_COLLECTIVES)
    + r")\b"
)
_OPNAME_RE = re.compile(r'op_name="([^"]+)"')


def _census(dump_dir: str) -> dict:
    fit_modules = [
        f
        for f in os.listdir(dump_dir)
        if "fit_fn" in f and f.endswith("after_optimizations.txt")
    ]
    assert fit_modules, f"no fit module dumped in {dump_dir}"
    path = os.path.join(dump_dir, sorted(fit_modules)[-1])
    per_step, per_fit = [], []
    for line in open(path):
        mm = _INSTR_RE.search(line)
        if not mm:
            continue
        dtype, dims, opcode = mm.groups()
        nm = _OPNAME_RE.search(line)
        op_name = nm.group(1) if nm else None
        shape = [int(d) for d in dims.split(",") if d] if dims else []
        nbytes = _DTYPE_BYTES.get(dtype, 4)
        for d in shape:
            nbytes *= d
        rec = {
            "op": opcode,
            "shape": f"{dtype}[{dims}]",
            "bytes": nbytes,
        }
        # Inside the step/epoch while body -> executes every loop
        # iteration; otherwise once per fit dispatch.
        if op_name and "/while/body/" in op_name:
            per_step.append(rec)
        else:
            per_fit.append(rec)
    def _summ(recs):
        by_op = {}
        for r in recs:
            e = by_op.setdefault(r["op"], {"count": 0, "bytes": 0, "shapes": []})
            e["count"] += 1
            e["bytes"] += r["bytes"]
            if r["shape"] not in e["shapes"]:
                e["shapes"].append(r["shape"])
        return {
            "total_count": len(recs),
            "total_bytes": sum(r["bytes"] for r in recs),
            "by_op": by_op,
        }
    return {
        "module": os.path.basename(path),
        "inside_step_loop": _summ(per_step),
        "outside_loops_once_per_fit": _summ(per_fit),
    }


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "_run":
        _run_fit(int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
        return
    out = {}
    for d, mdl in ((8, 1), (4, 2), (2, 1)):
        with tempfile.TemporaryDirectory() as td:
            env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
            r = subprocess.run(
                [sys.executable, __file__, "_run", str(d), str(mdl), td],
                capture_output=True,
                text=True,
                env=env,
                timeout=900,
            )
            assert r.returncode == 0, r.stderr[-3000:]
            out[f"data{d}_model{mdl}"] = _census(td)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
