"""Multi-host distribution test: a real ``jax.distributed`` process group.

Spawns 2 separate Python processes, each contributing 4 virtual CPU devices
(the SURVEY.md §4 multi-host simulation), and runs all three distributed
stages — sharded odometry, sharded mapping, points-sharded window BA — over
the GLOBAL 8-device mesh, with collectives crossing the process boundary.
Asserts both processes agree on every pose (the computation is replicated
after the collectives) and that results are finite.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np


ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(ROOT, "tests", "_mp_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_fleet_runs_all_sharded_stages():
    port = _free_port()
    nproc = 2
    env = dict(os.environ)
    env["PYTHONPATH"] = ROOT + os.pathsep + env.get("PYTHONPATH", "")
    # the workers configure platform/devices themselves (multihost.initialize)
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(port), str(nproc), str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            env=env, cwd=ROOT, text=True,
        )
        for pid in range(nproc)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{err[-4000:]}"
        line = [l for l in out.splitlines() if l.startswith("MPRESULT ")]
        assert line, out
        outs.append(json.loads(line[-1][len("MPRESULT "):]))

    assert all(o["n_dev"] == 8 for o in outs), outs
    for key in ("odo_t", "map_t", "ba_t"):
        a, b = np.asarray(outs[0][key]), np.asarray(outs[1][key])
        assert np.isfinite(a).all(), (key, a)
        np.testing.assert_allclose(a, b, atol=1e-6, err_msg=key)
