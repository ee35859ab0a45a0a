"""Cartpole friction model step tests."""

import jax
import jax.numpy as jnp
import numpy as np

from optimization_dynamics_tpu.dynamics import make_implicit_dynamics
from optimization_dynamics_tpu.models import cartpole

AUX = cartpole.CartpoleAux(h=0.05, friction=jnp.array([0.35, 0.35]))


def test_friction_dissipates():
    """A sliding cart decelerates; frictionless does not."""
    dyn_f = make_implicit_dynamics(cartpole.friction_model())
    dyn_n = make_implicit_dynamics(cartpole.frictionless_model(),
                                   kappa_eval_tol=1.0, kappa_grad_tol=1.0)
    aux_n = cartpole.CartpoleAux(h=0.05, friction=None)
    x = jnp.array([0.0, 0.0, 0.05, 0.0])     # 1 m/s slide
    yf, sf = jax.jit(dyn_f.step_info)(x, jnp.zeros(1), AUX)
    yn, sn = jax.jit(dyn_n.step_info)(x, jnp.zeros(1), aux_n)
    assert bool(sf.converged) and bool(sn.converged)
    assert float(yf[2]) < float(yn[2])


def test_static_friction_holds():
    """At rest with zero force the cart stays put (stick mode)."""
    dyn = make_implicit_dynamics(cartpole.friction_model())
    x = jnp.zeros(4)
    y, sol = jax.jit(dyn.step_info)(x, jnp.zeros(1), AUX)
    assert bool(sol.converged)
    np.testing.assert_allclose(np.asarray(y), np.zeros(4), atol=1e-6)


def test_step_jac_fd():
    dyn = make_implicit_dynamics(cartpole.friction_model(),
                                 kappa_eval_tol=1e-3, kappa_grad_tol=1e-3)
    x = jnp.array([0.0, 0.1, 0.03, 0.12])
    u = jnp.array([0.5])
    y, fx, fu = jax.jit(dyn.step_jac)(x, u, AUX)
    step = jax.jit(lambda x, u: dyn.step(x, u, AUX))
    eps = 1e-6
    fd = np.zeros((4, 4))
    for j in range(4):
        fd[:, j] = (step(x.at[j].add(eps), u)
                    - step(x.at[j].add(-eps), u)) / (2 * eps)
    np.testing.assert_allclose(np.asarray(fx), fd, atol=1e-4)


def test_friction_sweep_vmaps():
    """Friction coefficients travel through theta -> sweeps vmap."""
    dyn = make_implicit_dynamics(cartpole.friction_model())
    x = jnp.array([0.0, 0.0, 0.05, 0.0])
    frs = jnp.stack([jnp.full(2, f) for f in (0.05, 0.2, 0.35)])

    def step_fr(fr):
        return dyn.step(x, jnp.zeros(1),
                        cartpole.CartpoleAux(h=0.05, friction=fr))

    ys = jax.jit(jax.vmap(step_fr))(frs)
    # more friction -> less travel
    assert float(ys[0, 2]) > float(ys[1, 2]) > float(ys[2, 2])
