"""Driver entry points: single-chip compile check + multi-chip dry run."""

import os
import subprocess
import sys

import jax
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_entry_compiles_and_runs():
    sys.path.insert(0, REPO)
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (64, 3, 128, 256)
    assert out.dtype == np.uint8


@pytest.mark.full
def test_dryrun_multichip_subprocess():
    """Run exactly as the driver does: fresh process, XLA_FLAGS only."""
    env = dict(
        os.environ,
        XLA_FLAGS="--xla_force_host_platform_device_count=8",
        PYTHONPATH=REPO + ":" + os.environ.get("PYTHONPATH", ""),
    )
    env.pop("JAX_PLATFORMS", None)
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "__graft_entry__.py"), "8"],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert "dryrun_multichip OK" in res.stdout
