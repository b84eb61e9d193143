"""The README/quickstart example must actually run (the reference doc-tests
its README example under `cargo test`, ``src/lib.rs:22-58``)."""

import os
import subprocess
import sys

SCRIPT = os.path.join(os.path.dirname(__file__), "..", "examples", "quickstart.py")


def test_quickstart_example_runs():
    env = dict(os.environ)
    env["SBR_QUICKSTART_EPOCHS"] = "2"  # keep the CI gate fast
    env.setdefault("JAX_PLATFORMS", "cpu")
    out = subprocess.run(
        [sys.executable, SCRIPT], capture_output=True, text=True, env=env,
        timeout=600,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    assert "Test MRR:" in out.stdout
    # the serving path printed candidate scores
    assert "item " in out.stdout
