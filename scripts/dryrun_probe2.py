"""Probe: acrobot-impact regulation via solve_batched on an n-device CPU mesh."""
import os, sys, time
n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
T = int(sys.argv[2]) if len(sys.argv) > 2 else 21
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
    + f" --xla_force_host_platform_device_count={n}").strip()
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec
from optimization_dynamics_tpu.dynamics import make_implicit_dynamics
from optimization_dynamics_tpu.models import acrobot
from optimization_dynamics_tpu.solver.ilqr import ILQROptions, ILQRProblem
from optimization_dynamics_tpu.solver.ilqr_batched import solve_batched

t_begin = time.perf_counter()
dyn = make_implicit_dynamics(acrobot.impact_model())
aux = acrobot.AcrobotAux(h=0.05)
goal = jnp.array([0.2, 1.2, 0.2, 1.2])
prob = ILQRProblem(
    T=T, nx=4, nu=1, ncon=0, nconT=4,
    dynamics=lambda t, x, u: dyn.step(x, u, aux),
    dynamics_jac=lambda t, x, u: dyn.step_jac(x, u, aux),
    dynamics_jac_batched=lambda ts, xs, us: dyn.step_jac_batched(xs, us, aux),
    dynamics_batched=lambda t, xs, us: dyn.step_batched(xs, us, aux),
    stage_cost=lambda t, x, u: 0.5 * jnp.sum(u * u) + 0.5 * jnp.sum((x - goal) ** 2),
    terminal_cost=lambda x: 5.0 * jnp.sum((x - goal) ** 2),
    terminal_con=lambda x: x - goal,
)
opts = ILQROptions(max_iter=25, max_al_iter=6, con_tol=1e-2)
B = 2 * n
devices = jax.devices()[:n]
mesh = Mesh(np.asarray(devices), ("scenario",))
sharding = NamedSharding(mesh, PartitionSpec("scenario"))
rng = np.random.RandomState(0)
x0s = jax.device_put(jnp.asarray(
    np.tile(np.array([0.1, 1.0, 0.1, 1.0]), (B, 1)) + 0.05 * rng.randn(B, 4)),
    sharding)
us0 = jnp.zeros((T - 1, 1))
step = jax.jit(lambda xs: solve_batched(prob, xs, us0, opts))
t0 = time.perf_counter()
c = step.lower(x0s).compile()
t_c = time.perf_counter() - t0
t0 = time.perf_counter()
res = c(x0s); jax.block_until_ready(res.xs)
t_r = time.perf_counter() - t0
print(f"PROBE2 n={n} T={T} B={B} compile={t_c:.1f}s run={t_r:.1f}s "
      f"total={time.perf_counter()-t_begin:.1f}s "
      f"converged={int(jnp.sum(res.converged))}/{B} "
      f"devs={len(res.xs.sharding.device_set)}", flush=True)
