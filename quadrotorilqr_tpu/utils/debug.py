"""Numerical-health guards: NaN/Inf detection for batched solver outputs.

Replaces the reference's only failure handling (std::runtime_error throws,
quadrotor_model.cc:21-24, ilqr.hh:191-193) with batch-friendly equivalents:
per-scenario finiteness masks and a checkify-wrapped solve that surfaces the
first non-finite intermediate instead of silently propagating it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def check_finite(tree):
    """Per-lane finiteness mask: (B,) bool, True where ALL leaves of that
    scenario are finite. Leaves are (B, ...); jittable."""
    leaves = jax.tree.leaves(tree)
    mask = None
    for leaf in leaves:
        ok = jnp.all(
            jnp.isfinite(leaf.reshape(leaf.shape[0], -1)), axis=-1
        )
        mask = ok if mask is None else jnp.logical_and(mask, ok)
    return mask


def nonfinite_report(tree, names=None):
    """Host-side dict {leaf_path: count of non-finite entries} (non-jittable)."""
    import numpy as np

    out = {}
    leaves_with_path = jax.tree_util.tree_flatten_with_path(tree)[0]
    for path, leaf in leaves_with_path:
        arr = np.asarray(leaf)
        bad = int(np.size(arr) - np.isfinite(arr).sum())
        if bad:
            out[jax.tree_util.keystr(path)] = bad
    return out


def checkify_solve(solve_fn):
    """Wrap a solve function with jax.experimental.checkify NaN/div checks.

    >>> checked = checkify_solve(lambda t: solve(params, cost, t, dt, opts))
    >>> err, result = checked(traj)
    >>> err.throw()  # raises with the first NaN's location, if any
    """
    from jax.experimental import checkify

    return checkify.checkify(
        solve_fn, errors=checkify.float_checks
    )
