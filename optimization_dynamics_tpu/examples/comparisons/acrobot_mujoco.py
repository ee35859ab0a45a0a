"""Comparison oracle: acrobot swing-up via MuJoCo + finite differences.

Parity with /root/reference/examples/comparisons/acrobot/ — the same
swing-up solved with a general-purpose simulator (MuJoCo's soft joint
limits) and finite-difference Jacobians feeding the same iLQR. The
reference uses this to demonstrate where smooth/soft-contact gradients
struggle versus the relaxed-IFT gradients of optimization-based dynamics.

TPU wiring: MuJoCo is host-side C; steps and FD Jacobians enter the jitted
solver through ``jax.pure_callback`` (the XLA custom-call escape hatch).
This is intentionally a *baseline*, not a fast path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from optimization_dynamics_tpu.solver.ilqr import (
    ILQROptions,
    ILQRProblem,
    solve,
)

H = 0.05
T = 101
NQ, NU = 2, 1
NX = 2 * NQ

_XML = f"""
<mujoco>
  <option timestep="{H}" integrator="implicitfast" gravity="0 0 -9.81"/>
  <worldbody>
    <body name="upper" pos="0 0 0">
      <joint name="shoulder" type="hinge" axis="0 1 0"/>
      <geom type="capsule" fromto="0 0 0 0 0 -1" size="0.05" mass="1"/>
      <body name="lower" pos="0 0 -1">
        <joint name="elbow" type="hinge" axis="0 1 0" limited="true"
               range="-90 90"/>
        <geom type="capsule" fromto="0 0 0 0 0 -1" size="0.05" mass="1"/>
      </body>
    </body>
  </worldbody>
  <actuator><motor joint="elbow" gear="1"/></actuator>
</mujoco>
"""


class MuJoCoAcrobot:
    """Host-side stepper with FD Jacobians (reference
    comparisons/acrobot/mujoco_model.jl:62-74 pattern)."""

    def __init__(self, eps: float = 1.0e-6):
        import mujoco
        self._mujoco = mujoco
        self.model = mujoco.MjModel.from_xml_string(_XML)
        self.data = mujoco.MjData(self.model)
        self.eps = eps

    def _step_np(self, x, u):
        mujoco, m, d = self._mujoco, self.model, self.data
        d.qpos[:] = x[:NQ]
        d.qvel[:] = x[NQ:]
        d.ctrl[:] = u
        mujoco.mj_step(m, d)
        return np.concatenate([d.qpos, d.qvel]).astype(x.dtype)

    def _jac_np(self, x, u):
        y0 = self._step_np(x, u)
        fx = np.zeros((NX, NX), x.dtype)
        fu = np.zeros((NX, NU), x.dtype)
        for j in range(NX):
            xp = x.copy(); xp[j] += self.eps
            xm = x.copy(); xm[j] -= self.eps
            fx[:, j] = (self._step_np(xp, u)
                        - self._step_np(xm, u)) / (2 * self.eps)
        for j in range(NU):
            up = u.copy(); up[j] += self.eps
            um = u.copy(); um[j] -= self.eps
            fu[:, j] = (self._step_np(x, up)
                        - self._step_np(x, um)) / (2 * self.eps)
        return y0, fx, fu

    # ---- jit-safe wrappers ----
    def step(self, x, u):
        dtype = x.dtype
        shape = jax.ShapeDtypeStruct((NX,), dtype)
        return jax.pure_callback(
            lambda x, u: self._step_np(np.asarray(x), np.asarray(u)),
            shape, x, u, vmap_method="sequential")

    def step_jac(self, x, u):
        dtype = x.dtype
        shapes = (jax.ShapeDtypeStruct((NX,), dtype),
                  jax.ShapeDtypeStruct((NX, NX), dtype),
                  jax.ShapeDtypeStruct((NX, NU), dtype))
        return jax.pure_callback(
            lambda x, u: self._jac_np(np.asarray(x), np.asarray(u)),
            shapes, x, u, vmap_method="sequential")


def build_problem(dtype=jnp.float64, T: int = T):
    sim = MuJoCoAcrobot()
    xT = jnp.array([jnp.pi, 0.0, 0.0, 0.0], dtype)   # velocity-state form

    def stage_cost(t, x, u):
        v = x[NQ:]
        return 0.5 * 0.1 * v @ v + 0.5 * u @ u

    def terminal_cost(x):
        v = x[NQ:]
        return 0.5 * 0.1 * v @ v

    prob = ILQRProblem(
        T=T, nx=NX, nu=NU, ncon=0, nconT=NX,
        dynamics=lambda t, x, u: sim.step(x, u),
        dynamics_jac=lambda t, x, u: sim.step_jac(x, u),
        stage_cost=stage_cost,
        terminal_cost=terminal_cost,
        terminal_con=lambda x: x - xT,
    )
    opts = ILQROptions(
        obj_tol=1.0e-5, grad_tol=1.0e-5, max_iter=50, max_al_iter=20,
        con_tol=0.001)
    x0 = jnp.zeros(NX, dtype)
    key = jax.random.PRNGKey(1)
    us0 = 1.0e-3 * jax.random.normal(key, (T - 1, NU), dtype)
    return prob, x0, us0, opts


def run():
    prob, x0, us0, opts = build_problem()
    # pure_callback is not vmappable over FD batches -> run unjitted outer
    res = solve(prob, x0, us0, opts)
    return prob, res


def study(artifact_path: str | None = None):
    """The reference's comparison *study*
    (/root/reference/examples/comparisons/acrobot/acrobot.jl:93-102): run
    the full T=101 swing-up through MuJoCo soft limits + FD Jacobians and
    record whether the smooth-gradient path converges.

    Measured result (2026-08-18, CPU f64, committed at
    docs/mujoco_study.json): **stuck** — 870 inner iterations across all
    20 AL rounds, terminal violation 2.2e-2 (con_tol 1e-3 never met),
    final gradient norm ~3.4e16, and the soft elbow limit is transiently
    violated up to |q2| = 2.96 rad against the pi/2 hard limit. The
    relaxed-IFT acrobot-limits solve converges at objective 67.4 with the
    limit respected (BASELINE.md) — the paper's argument reproduced.
    """
    import json
    import numpy as np

    prob, res = run()
    xs = np.asarray(res.xs)
    out = {
        "study": "acrobot swing-up via MuJoCo soft limits + FD Jacobians",
        "reference":
            "/root/reference/examples/comparisons/acrobot/acrobot.jl:93-102",
        "T": T, "h": H, "con_tol": 0.001,
        "converged": bool(res.converged),
        "objective": float(res.objective),
        "constraint_violation": float(res.constraint_violation),
        "iterations": int(res.iterations),
        "al_iterations": int(res.al_iterations),
        "gradient_norm": float(res.gradient_norm),
        "max_abs_elbow": float(np.abs(xs[:, 1]).max()),
        "elbow_hard_limit": float(np.pi / 2),
        "xT": xs[-1].tolist(),
    }
    if artifact_path:
        with open(artifact_path, "w") as f:
            json.dump(out, f, indent=2)
    return out


def main():
    import sys
    if "--study" in sys.argv:
        out = study(artifact_path="docs/mujoco_study.json"
                    if "--save" in sys.argv else None)
        print({k: v for k, v in out.items() if k != "xT"})
        return
    prob, res = run()
    print("converged:", bool(res.converged),
          "obj:", float(res.objective),
          "vio:", float(res.constraint_violation),
          "iters:", int(res.iterations))


if __name__ == "__main__":
    main()
