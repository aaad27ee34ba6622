"""Multi-process distributed test (VERDICT round-1 item 5).

Spawns 2 real OS processes x 4 CPU devices each, joins them with
jax.distributed, and asserts the global-mesh attack-step trajectory with
per-host batch assembly equals the single-process 8-device trajectory.
The heavy lifting lives in scripts/multihost_sim.py (also exposed as
__graft_entry__.dryrun_multihost); this wrapper makes it part of the suite.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_two_process_trajectory_matches_single_process():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "multihost_sim.py"),
            "--processes=2",
            "--devices-per-proc=4",
        ],
        env=env,
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    assert '"multihost_sim": "ok"' in proc.stdout, proc.stdout[-2000:]
