import jax.numpy as jnp
import numpy as np

from optimization_dynamics_tpu.ops.cones import (
    ConeSpec,
    cone_product,
    interior_init,
    orthant_step_to_boundary,
    soc_step_to_boundary,
    step_to_boundary,
)


def test_cone_product():
    a = jnp.array([2.0, 1.0, 0.5])
    b = jnp.array([3.0, -1.0, 0.25])
    out = cone_product(a, b)
    np.testing.assert_allclose(out[0], 2 * 3 + 1 * (-1) + 0.5 * 0.25)
    np.testing.assert_allclose(out[1:], a[0] * b[1:] + b[0] * a[1:])


def test_orthant_step():
    z = jnp.array([1.0, 2.0])
    d = jnp.array([0.5, -1.0])  # z - a d: only first coord decreases
    a = orthant_step_to_boundary(z, d)
    np.testing.assert_allclose(a, 2.0)


def test_soc_step_interior_direction():
    z = jnp.array([2.0, 0.0, 0.0])
    d = jnp.array([-1.0, 0.0, 0.0])  # moves deeper into cone
    a = soc_step_to_boundary(z, d)
    assert a > 1e6  # unbounded


def test_soc_step_boundary_crossing():
    z = jnp.array([1.0, 0.0])
    d = jnp.array([0.0, -2.0])  # z - a d = (1, 2a): leaves cone at a=0.5
    a = soc_step_to_boundary(z, d)
    np.testing.assert_allclose(a, 0.5, atol=1e-10)

    # verify the boundary point is on the cone
    zb = z - a * d
    np.testing.assert_allclose(zb[0], jnp.abs(zb[1]), atol=1e-10)


def test_step_to_boundary_mixed():
    spec = ConeSpec(
        nz=6, ntheta=1,
        eq_rows=(0, 1),
        ort_prim=(0,), ort_dual=(1,), ort_rows=(2,),
        soc_prim=((2, 3),), soc_dual=((4, 5),), soc_rows=((3, 4),),
    )
    # don't validate (rows made up), just exercise variable indices
    z = jnp.array([1.0, 1.0, 1.0, 0.0, 1.0, 0.0])
    d = jnp.array([2.0, 0.0, 0.0, -4.0, 0.0, 0.0])
    a = step_to_boundary(spec, z, d, tau=1.0)
    # orthant limit: 1/2 = 0.5; soc limit: (1, 4a) crosses at 0.25
    np.testing.assert_allclose(a, 0.25, atol=1e-10)


def test_interior_init():
    spec = ConeSpec(
        nz=6, ntheta=1,
        ort_prim=(0,), ort_dual=(1,),
        soc_prim=((2, 3),), soc_dual=((4, 5),),
    )
    z = interior_init(spec, jnp.zeros(6))
    np.testing.assert_allclose(z, jnp.array([1.0, 1.0, 1.0, 0.1, 1.0, 0.1]))
