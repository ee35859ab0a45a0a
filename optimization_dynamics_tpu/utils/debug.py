"""Debug checks: NaN guards and per-lane finiteness (SURVEY.md §5).

The reference has no sanitizers (single-threaded Julia; its only
robustness mechanism is the IP line search, SURVEY.md §5 "Race
detection"). The TPU build's equivalents:

* ``nan_guard()`` — context manager enabling ``jax_debug_nans`` so the
  first NaN-producing primitive raises with a stack trace (use on CPU
  repros; under jit it re-runs op-by-op);
* ``check_finite(tree)`` — per-lane finiteness flags over a batched
  result pytree (lockstep solvers keep NaNs lane-local; this surfaces
  which lanes went bad without host round-trips per field);
* ``assert_finite(tree)`` — raise with the offending field names.
"""

from __future__ import annotations

import contextlib
from typing import Iterable

import jax
import jax.numpy as jnp

__all__ = ["nan_guard", "check_finite", "assert_finite"]


@contextlib.contextmanager
def nan_guard(enable: bool = True):
    """Enable ``jax_debug_nans`` within the block (and restore after).

    Typical use: re-run a failing CPU repro under the guard to get the
    first NaN's originating primitive instead of a poisoned result.
    """
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", bool(enable))
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def check_finite(tree, batch_axis: int = 0) -> jnp.ndarray:
    """Per-lane all-finite flags over a batched pytree.

    Every array leaf with a leading batch axis contributes; scalars and
    mismatched leaves are reduced over all elements into every lane.
    Returns a bool vector of the common leading-axis size.
    """
    leaves = [l for l in jax.tree_util.tree_leaves(tree)
              if hasattr(l, "dtype") and jnp.issubdtype(l.dtype,
                                                        jnp.inexact)]
    if not leaves:
        raise ValueError("no floating-point leaves to check")
    B = max(l.shape[0] for l in leaves if l.ndim > 0)
    ok = jnp.ones(B, bool)
    for l in leaves:
        if l.ndim > 0 and l.shape[0] == B:
            ok = jnp.logical_and(
                ok, jnp.all(jnp.isfinite(l.reshape(B, -1)), axis=1))
        else:
            ok = jnp.logical_and(ok, jnp.all(jnp.isfinite(l)))
    return ok


def assert_finite(tree, names: Iterable[str] | None = None) -> None:
    """Raise ``FloatingPointError`` naming the non-finite fields."""
    bad = []
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    for path, leaf in flat:
        if (hasattr(leaf, "dtype")
                and jnp.issubdtype(leaf.dtype, jnp.inexact)
                and not bool(jnp.all(jnp.isfinite(leaf)))):
            bad.append(jax.tree_util.keystr(path))
    if bad:
        raise FloatingPointError(
            "non-finite values in: " + ", ".join(bad))
