"""Driver-deliverable regression tests for __graft_entry__.py.

dryrun_multichip must pass from ANY caller backend; the driver calls it in a
process whose backend has a single (axon TPU) device. We simulate that with a
single-CPU-device subprocess: the function must detect the shortage and
re-exec itself under an 8-device virtual CPU backend.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_dryrun_multichip_reexecs_from_single_device_backend():
    env = dict(os.environ)
    # force a 1-device CPU backend in the child (driver-like shortage)
    env["XLA_FLAGS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    script = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "assert len(jax.devices()) == 1, jax.devices()\n"
        f"import sys; sys.path.insert(0, {REPO!r})\n"
        "import __graft_entry__ as g\n"
        "g.dryrun_multichip(8)\n"
    )
    proc = subprocess.run([sys.executable, "-c", script], env=env, cwd=REPO,
                          capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "mesh={'data': 4, 'model': 2}" in proc.stdout
    assert "OK" in proc.stdout


def test_dryrun_multichip_inprocess_on_fake_mesh():
    # under the conftest's 8-device CPU backend it runs in-process
    import __graft_entry__ as g
    g.dryrun_multichip(8)
