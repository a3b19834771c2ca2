"""Two-PROCESS jax.distributed smoke (VERDICT r1 item 8).

Everything else in tests/ simulates multi-chip on one process's virtual
mesh; this launches two actual OS processes that join a jax.distributed
cluster over gloo and run one hypothesis-sharded RANSAC whose all_gather
winner reduction crosses the process boundary. Both processes must agree on
the winner bit-for-bit.
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # multi-minute on the 2-core CI host; fast path = -m "not slow"

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_ransac():
    # (subprocess.communicate carries its own 240 s timeout)
    port = _free_port()
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    # One device per process: the global mesh spans the process boundary.
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [
                sys.executable,
                "-m",
                "vo_tpu.dist.multihost_smoke",
                "--processes",
                "2",
                "--process-id",
                str(pid),
                "--port",
                str(port),
            ],
            cwd=REPO,
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"proc failed:\n{err[-2000:]}"
        line = [l for l in out.splitlines() if l.startswith("{")][-1]
        outs.append(json.loads(line))

    assert all(o["n_global_devices"] == 2 for o in outs), outs
    assert all(o["ok"] for o in outs), outs
    assert all(o["n_inliers"] >= 100 for o in outs), outs
    # The collectives contract: both hosts hold the SAME winner.
    np.testing.assert_array_equal(np.asarray(outs[0]["t"]), np.asarray(outs[1]["t"]))
