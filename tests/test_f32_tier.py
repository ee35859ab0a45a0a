"""CPU-f32 test tier (VERDICT round-1 #2).

The TPU runs f32 with loosened tolerances (r_tol 3e-5, kappa 1e-3,
rho_max 1e6 — bench.py); the round-1 convergence collapse (1/64 lanes)
was invisible to the f64 CPU suite. This tier runs the exact bench
configuration on CPU with x64 OFF, in a subprocess (the global x64
switch must not leak into the cached f64 jits of this process).

The collapse itself was bisected with scripts/repro_f32.py: warm-started
line-search rollouts (dynamics_batched_ws) converge 6/16 lanes — in
f64 too (3/16), so it is branch selection, not precision — while cold
line-search rollouts converge 16/16 in f32. This test pins the cold
configuration's f32 convergence so it can never silently regress.
"""

import os
import re
import subprocess
import sys

import pytest

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REPRO = os.path.join(HERE, "scripts", "repro_f32.py")


@pytest.mark.slow
def test_f32_batched_cartpole_friction_converges():
    env = dict(os.environ)
    env["PYTHONPATH"] = HERE + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable, REPRO, "--B", "8", "--no-ws",
         "--solver", "segmented"],
        capture_output=True, text=True, timeout=1800, env=env)
    assert out.returncode == 0, out.stderr[-2000:]
    m = re.search(r"converged (\d+)/(\d+)", out.stdout)
    assert m, out.stdout[-2000:]
    n_conv, B = int(m.group(1)), int(m.group(2))
    # f32 at the bench tolerances must not lose more than one lane
    assert n_conv >= B - 1, out.stdout[-2000:]
