"""Multi-host (DCN) execution test: 2 processes over localhost.

SURVEY.md §2.5 requires the multi-host path to exist and run:
``jax.distributed.initialize`` + one scenario mesh spanning processes.
This launches two worker processes (scripts/multihost_worker.py), each
with 4 virtual CPU devices, solving a scenario batch sharded across the
8 global devices — the same code path a v5e pod slice would take over
DCN, minus the hardware.
"""

import os
import socket
import subprocess
import sys

import pytest

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(HERE, "scripts", "multihost_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_sharded_solve():
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = HERE + os.pathsep + env.get("PYTHONPATH", "")
    # workers configure their own platform/device env
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env)
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=600)
            outs.append((p.returncode, out, err))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for rc, out, err in outs:
        assert rc == 0, f"worker failed rc={rc}\nstdout:{out}\nstderr:{err}"
        assert "MULTIHOST_OK" in out, out
