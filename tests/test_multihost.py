"""Multi-host process-group validation inside pytest (SURVEY.md §4 item 4).

Spawns scripts/multihost_demo.py: 2 local jax.distributed processes (4 CPU
devices each) run the unified sharded step on their own half of a read set;
process 0 asserts the DCN-merged accumulators exactly equal a single-process
reference, and reports the per-batch collective traffic — the config-5
scaling proxy available without pod hardware.
"""

import os
import subprocess
import sys

import pytest

SCRIPT = os.path.join(os.path.dirname(__file__), "..", "scripts",
                      "multihost_demo.py")


def test_multihost_merge_matches_single_process(tmp_path):
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    env["MULTIHOST_DEMO_REF"] = str(tmp_path / "ref.npz")
    env["MULTIHOST_DEMO_PORT"] = "9417"
    res = subprocess.run(
        [sys.executable, SCRIPT], env=env, capture_output=True, text=True,
        timeout=540,
    )
    assert res.returncode == 0, res.stdout + res.stderr
    assert "MULTIHOST_OK" in res.stdout, res.stdout + res.stderr
    assert "merged accumulators == single-process reference" in res.stdout
