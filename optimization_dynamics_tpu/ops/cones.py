"""Cone algebra for the interior-point solver.

The variable space of each implicit-dynamics solve is partitioned into

  * free (equality-only) variables,
  * nonnegative-orthant primal/dual pairs ``(y_i, s_i)`` with
    complementarity ``y_i * s_i = kappa``,
  * second-order-cone (SOC) primal/dual groups ``(p, d)`` with the
    Jordan-algebra complementarity ``p ∘ d = kappa * e``.

This mirrors the ``IndicesOptimization`` bundle of the reference engine
(see /root/reference/src/models/planar_push/simulator.jl:16-50 and
/root/reference/src/models/rocket/dynamics.jl:52-63) but is expressed as a
static, hashable spec so every solver function can be traced once by XLA and
vmapped over scenario batches.

All functions are branch-free and fixed-shape: they are safe inside
``jax.lax.while_loop``/``scan`` and under ``jax.vmap``.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp
import numpy as np

__all__ = [
    "ConeSpec",
    "cone_product",
    "delta_products",
    "soc_step_to_boundary",
    "orthant_step_to_boundary",
    "step_to_boundary",
    "interior_init",
]

_BIG = 1e12


@dataclasses.dataclass(frozen=True)
class ConeSpec:
    """Static index bundle describing the cone structure of one problem.

    Indices are 0-based. ``ort_prim[i]`` pairs with ``ort_dual[i]``.
    ``soc_prim[g]``/``soc_dual[g]`` are the variable indices of SOC group
    ``g`` (first entry is the cone "axis" component, i.e. ``p0 >= |p1:|``).
    ``eq_rows`` / ``ort_rows`` / ``soc_rows`` partition the residual rows
    into equality rows and bilinear (complementarity) rows.
    """

    nz: int
    ntheta: int
    eq_rows: Tuple[int, ...] = ()
    ort_prim: Tuple[int, ...] = ()
    ort_dual: Tuple[int, ...] = ()
    ort_rows: Tuple[int, ...] = ()
    soc_prim: Tuple[Tuple[int, ...], ...] = ()
    soc_dual: Tuple[Tuple[int, ...], ...] = ()
    soc_rows: Tuple[Tuple[int, ...], ...] = ()

    @property
    def bil_rows(self) -> Tuple[int, ...]:
        rows = tuple(self.ort_rows)
        for g in self.soc_rows:
            rows = rows + tuple(g)
        return rows

    @property
    def num_cone_vars(self) -> int:
        n = 2 * len(self.ort_prim)
        for g in self.soc_prim:
            n += 2 * len(g)
        return n

    def validate(self) -> None:
        assert len(self.ort_prim) == len(self.ort_dual) == len(self.ort_rows)
        assert len(self.soc_prim) == len(self.soc_dual) == len(self.soc_rows)
        for p, d, r in zip(self.soc_prim, self.soc_dual, self.soc_rows):
            assert len(p) == len(d) == len(r)
        all_rows = list(self.eq_rows) + list(self.bil_rows)
        assert sorted(all_rows) == list(range(self.nz)), (
            "residual rows must partition 0..nz-1"
        )


def cone_product(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Jordan-algebra product of two SOC vectors.

    ``a ∘ b = [aᵀ b; a0 * b[1:] + b0 * a[1:]]`` — the complementarity
    operator used in the reference residuals (e.g.
    /root/reference/src/models/cartpole/model.jl:111-112).
    """
    head = jnp.sum(a * b, keepdims=True)
    tail = a[0] * b[1:] + b[0] * a[1:]
    return jnp.concatenate([head, tail])


def delta_products(spec: "ConeSpec", d: jnp.ndarray) -> jnp.ndarray:
    """Second-order complementarity products of a Newton direction.

    Returns a ``(nz,)`` vector carrying ``Δw ∘ Δλ`` on the bilinear
    residual rows (zeros elsewhere): the Mehrotra correction term — the
    TPU-native equivalent of ``RoboDojo.general_correction_term!``
    (imported at /root/reference/src/OptimizationDynamics.jl:17 and used
    by the reference's predictor-corrector inner solver). For an update
    ``z_new = z - α d`` the complementarity rows evolve as
    ``w∘λ - α·lin(d) + α² Δw∘Δλ``; the corrector cancels the quadratic
    term at α = 1.
    """
    out = jnp.zeros(spec.nz, d.dtype)
    if spec.ort_prim:
        p = np.asarray(spec.ort_prim)
        q = np.asarray(spec.ort_dual)
        r = np.asarray(spec.ort_rows)
        out = out.at[r].set(d[p] * d[q])
    for prim, dual, rows in zip(spec.soc_prim, spec.soc_dual, spec.soc_rows):
        out = out.at[np.asarray(rows)].set(
            cone_product(d[np.asarray(prim)], d[np.asarray(dual)]))
    return out


def _pos_root_step(z0, z1, d0, d1):
    """Largest alpha in [0, BIG] with ``z - alpha d`` remaining in the SOC.

    Membership: ``(z0 - a d0)^2 - ||z1 - a d1||^2 >= 0`` and ``z0 - a d0 >= 0``.
    Solves the quadratic ``A a^2 + B a + C = 0`` with
    ``A = d0^2 - d1.d1``, ``B = -2 (z0 d0 - z1.d1)``, ``C = z0^2 - z1.z1``.
    Returns the smallest positive root (boundary crossing) or BIG.
    Branch-free (uses jnp.where).
    """
    A = d0 * d0 - jnp.sum(d1 * d1)
    B = -2.0 * (z0 * d0 - jnp.sum(z1 * d1))
    C = z0 * z0 - jnp.sum(z1 * z1)

    # linear-edge step where axis component would go negative
    a_axis = jnp.where(d0 > 0, z0 / jnp.where(d0 > 0, d0, 1.0), _BIG)

    disc = B * B - 4.0 * A * C
    sqrt_disc = jnp.sqrt(jnp.maximum(disc, 0.0))
    safe_A = jnp.where(jnp.abs(A) > 1e-30, A, 1.0)
    r1 = (-B - sqrt_disc) / (2.0 * safe_A)
    r2 = (-B + sqrt_disc) / (2.0 * safe_A)
    lo = jnp.minimum(r1, r2)
    hi = jnp.maximum(r1, r2)
    # smallest positive root of the quadratic
    quad_root = jnp.where(lo > 0, lo, jnp.where(hi > 0, hi, _BIG))
    # linear case A ~ 0: root -C/B if it is positive
    lin_root = jnp.where(
        jnp.abs(B) > 1e-30, -C / jnp.where(jnp.abs(B) > 1e-30, B, 1.0), _BIG
    )
    lin_root = jnp.where(lin_root > 0, lin_root, _BIG)
    root = jnp.where(jnp.abs(A) > 1e-30, quad_root, lin_root)
    root = jnp.where(disc >= 0, root, _BIG)
    # no real crossing -> only axis bound applies
    return jnp.minimum(root, a_axis)


def soc_step_to_boundary(z_g: jnp.ndarray, d_g: jnp.ndarray) -> jnp.ndarray:
    """Max step alpha so that ``z_g - alpha * d_g`` stays in the SOC."""
    return _pos_root_step(z_g[0], z_g[1:], d_g[0], d_g[1:])


def orthant_step_to_boundary(z_o: jnp.ndarray, d_o: jnp.ndarray) -> jnp.ndarray:
    """Max step alpha so that ``z_o - alpha * d_o`` stays elementwise >= 0."""
    ratio = jnp.where(d_o > 0, z_o / jnp.where(d_o > 0, d_o, 1.0), _BIG)
    return jnp.min(ratio) if ratio.size else jnp.asarray(_BIG, z_o.dtype)


def step_to_boundary(spec: ConeSpec, z: jnp.ndarray, d: jnp.ndarray,
                     tau: float = 0.99) -> jnp.ndarray:
    """Fraction-to-boundary step length for the Newton direction ``d``.

    Computes ``alpha = min(1, tau * alpha_max)`` where ``alpha_max`` is the
    largest step keeping every orthant pair positive and every SOC group in
    its cone, for the update ``z_new = z - alpha * d``.
    """
    dtype = z.dtype
    alpha = jnp.asarray(_BIG, dtype)
    ort_idx = list(spec.ort_prim) + list(spec.ort_dual)
    if ort_idx:
        idx = np.asarray(ort_idx)
        alpha = jnp.minimum(alpha, orthant_step_to_boundary(z[idx], d[idx]))
    for prim, dual in zip(spec.soc_prim, spec.soc_dual):
        p = np.asarray(prim)
        q = np.asarray(dual)
        alpha = jnp.minimum(alpha, soc_step_to_boundary(z[p], d[p]))
        alpha = jnp.minimum(alpha, soc_step_to_boundary(z[q], d[q]))
    return jnp.minimum(jnp.asarray(1.0, dtype), tau * alpha)


def interior_init(spec: ConeSpec, z: jnp.ndarray,
                  ort_val: float = 1.0, soc_axis: float = 1.0,
                  soc_tail: float = 0.1) -> jnp.ndarray:
    """Push the cone variables of ``z`` to a strictly interior point.

    Mirrors the per-model ``initialize_z!`` warm starts of the reference
    (e.g. /root/reference/src/models/cartpole/simulator_friction.jl:36-42).
    """
    if spec.ort_prim:
        idx = np.asarray(list(spec.ort_prim) + list(spec.ort_dual))
        z = z.at[idx].set(ort_val)
    for prim, dual in zip(spec.soc_prim, spec.soc_dual):
        for grp in (prim, dual):
            g = np.asarray(grp)
            z = z.at[g[0]].set(soc_axis)
            z = z.at[g[1:]].set(soc_tail)
    return z
