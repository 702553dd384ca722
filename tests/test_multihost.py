"""Multi-host tier (SURVEY.md section 4.3): the jax.distributed loopback
dry-run must pass — dp spanning processes, the index hash-range-sharded
across processes with a cross-process all_to_all, and the collective
stats/quantile (see multihost_dryrun.py)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_multihost_dryrun_loopback():
    env = dict(os.environ)
    # workers force their own backend/device count; drop the test
    # harness's 8-device single-process setup
    for k in ("JAX_PLATFORMS", "JAX_PLATFORM_NAME", "XLA_FLAGS"):
        env.pop(k, None)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "multihost_dryrun.py")],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=540,
    )
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
    assert "multihost dryrun: OK" in r.stdout
