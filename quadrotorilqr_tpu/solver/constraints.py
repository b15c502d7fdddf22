"""Ready-made stage-constraint builders for solver/auglag.solve_auglag.

Every builder returns a function `g(x: State, u, k) -> (n_c,)` with the
FEASIBLE region g <= 0, written for one stage with plain jnp — autodiff
(solver/auglag lifts it to the Lie tangent) gives exact Jacobians, so new
constraint families need nothing but this value function. `combine` stacks
several into one vector; constraints are per-stage uniform (use `k` inside
your own function for time-varying sets, e.g. moving obstacles).

Smoothness note: keep-out distances use squared norms (r^2 - ||d||^2), not
norms, so gradients stay finite at the obstacle center an infeasible
initial trajectory may cross.
"""

from __future__ import annotations

import jax.numpy as jnp


def combine(*constraint_fns):
    """Stack several constraint functions into one (n_c_total,) vector."""

    def g(x, u, k):
        return jnp.concatenate([jnp.atleast_1d(f(x, u, k)) for f in constraint_fns])

    return g


def sphere_keepout(center, radius):
    """Stay OUTSIDE a sphere: r^2 - ||p - c||^2 <= 0."""
    center = jnp.asarray(center)
    r2 = float(radius) ** 2

    def g(x, u, k):
        d = x.pose.trans - center.astype(x.pose.trans.dtype)
        return jnp.atleast_1d(r2 - jnp.sum(d * d))

    return g


def ball_keepin(center, radius):
    """Stay INSIDE a ball: ||p - c||^2 - r^2 <= 0."""
    center = jnp.asarray(center)
    r2 = float(radius) ** 2

    def g(x, u, k):
        d = x.pose.trans - center.astype(x.pose.trans.dtype)
        return jnp.atleast_1d(jnp.sum(d * d) - r2)

    return g


def halfspace(normal, offset):
    """Stay on the n'p >= b side: b - n'p <= 0 (e.g. floor: n=e_z, b=0)."""
    normal = jnp.asarray(normal)

    def g(x, u, k):
        n = normal.astype(x.pose.trans.dtype)
        return jnp.atleast_1d(offset - jnp.dot(n, x.pose.trans))

    return g


def speed_limit(v_max, angular=False):
    """Body linear (or angular) speed cap: ||v||^2 - v_max^2 <= 0."""
    vmax2 = float(v_max) ** 2
    sl = slice(3, 6) if angular else slice(0, 3)

    def g(x, u, k):
        v = x.vel[..., sl]
        return jnp.atleast_1d(jnp.sum(v * v) - vmax2)

    return g


def tilt_limit(max_tilt_rad):
    """Attitude cone: the body z-axis stays within `max_tilt_rad` of world
    up — cos(theta_max) - (R e_z).e_z <= 0. Smooth everywhere (no acos);
    the standard safe-attitude envelope for multirotors."""
    import math

    cos_max = math.cos(float(max_tilt_rad))

    def g(x, u, k):
        # (R e_z).e_z = R[2,2] = 1 - 2(qx^2 + qy^2) for a unit wxyz quat
        q = x.pose.quat
        r22 = 1.0 - 2.0 * (q[..., 1] * q[..., 1] + q[..., 2] * q[..., 2])
        return jnp.atleast_1d(cos_max - r22)

    return g


def cylinder_keepout(center_xy, radius):
    """Stay outside an infinite vertical cylinder (no-fly column):
    r^2 - ||p_xy - c||^2 <= 0. Squared form keeps gradients finite on the
    axis (same rationale as sphere_keepout)."""
    center_xy = jnp.asarray(center_xy)
    r2 = float(radius) ** 2

    def g(x, u, k):
        d = x.pose.trans[..., 0:2] - center_xy.astype(x.pose.trans.dtype)
        return jnp.atleast_1d(r2 - jnp.sum(d * d))

    return g


def altitude_band(z_min, z_max):
    """Fly inside [z_min, z_max]: [z_min - z; z - z_max] <= 0."""

    def g(x, u, k):
        z = x.pose.trans[..., 2]
        return jnp.stack([z_min - z, z - z_max])

    return g


def control_box(lo, hi):
    """Elementwise control box as inequalities: [u - hi; lo - u] <= 0.

    For box-ONLY problems prefer solver/constrained.solve_box (exact active
    sets, no multiplier loop); this builder exists to mix boxes with state
    constraints in one solve_auglag call.
    """
    lo = jnp.asarray(lo)
    hi = jnp.asarray(hi)

    def g(x, u, k):
        l = jnp.broadcast_to(lo.astype(u.dtype), u.shape)
        h = jnp.broadcast_to(hi.astype(u.dtype), u.shape)
        return jnp.concatenate([u - h, l - u])

    return g
