"""SO(3) on unit quaternions (w, x, y, z) — TPU-native, batch-polymorphic.

Implements the rotation-group primitives the SE(3) layer is built on:
exp/log maps, left/right Jacobians and their inverses, hat/vee, rotation
matrices and quaternion algebra. Conventions match manif's SO3 (used by the
reference at /root/reference/src/quadrotor_model.cc:183-186, 232-234):

  * tangent is the rotation vector theta in R^3 (radians),
  * Exp(theta) = quaternion of the rotation by angle |theta| about theta/|theta|,
  * Log picks the representative with angle in (-pi, pi] (w < 0 handled by
    angle reflection, as in manif's SO3::log()),
  * Jl(theta) = I + B(θ)·W + C(θ)·W²  with W = hat(theta),
    B = (1-cosθ)/θ², C = (θ-sinθ)/θ³,
  * Jr(theta) = Jl(-theta),
  * Jl⁻¹ = I - ½W + D(θ)·W²,  D = 1/θ² - (1+cosθ)/(2θ sinθ),
  * Jr⁻¹ = Jl⁻¹(-theta).

All functions broadcast over arbitrary leading batch dims and preserve the
input dtype (float32 for TPU throughput, float64 for CPU parity oracles).
Small-angle regimes use branchless Taylor selection that is safe under
jax.grad (no NaN cotangents from the unused branch).
"""

from __future__ import annotations

import jax.numpy as jnp

# Threshold under which Taylor expansions replace the exact trig ratios.
# 1e-3 rad keeps both branches accurate to ~1e-13 in f64 and well inside
# f32 roundoff; the crossover error is far below test tolerances.
_SMALL_ANGLE = 1e-3


def _safe(theta_sq, small):
    """Replace tiny values with 1.0 so exact-branch math never divides by ~0."""
    return jnp.where(small, jnp.ones_like(theta_sq), theta_sq)


def hat(v):
    """R^3 -> so(3): skew-symmetric matrix. v: (..., 3) -> (..., 3, 3)."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def vee(m):
    """so(3) -> R^3. m: (..., 3, 3) -> (..., 3)."""
    return jnp.stack([m[..., 2, 1], m[..., 0, 2], m[..., 1, 0]], axis=-1)


# ---------------------------------------------------------------------------
# Quaternion algebra (w, x, y, z)
# ---------------------------------------------------------------------------


def quat_identity(batch_shape=(), dtype=jnp.float32):
    q = jnp.zeros(batch_shape + (4,), dtype=dtype)
    return q.at[..., 0].set(1.0)


def quat_multiply(a, b):
    """Hamilton product, (...,4) x (...,4) -> (...,4), both wxyz."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_conjugate(q):
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_normalize(q):
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_rotate(q, v):
    """Rotate vector(s) v (...,3) by quaternion(s) q (...,4).

    Uses the expanded Rodrigues form (2 cross products) — cheaper and more
    VPU-friendly than materializing the 3x3 matrix when used once.
    """
    qw = q[..., 0:1]
    qv = q[..., 1:4]
    t = 2.0 * jnp.cross(qv, v)
    return v + qw * t + jnp.cross(qv, t)


def quat_to_matrix(q):
    """Unit quaternion (...,4) wxyz -> rotation matrix (...,3,3)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], axis=-1),
            jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], axis=-1),
            jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], axis=-1),
        ],
        axis=-2,
    )


# ---------------------------------------------------------------------------
# Exp / Log
# ---------------------------------------------------------------------------


def exp(theta):
    """so(3) -> SO(3): rotation vector (...,3) -> unit quaternion (...,4) wxyz."""
    theta_sq = jnp.sum(theta * theta, axis=-1)
    small = theta_sq < _SMALL_ANGLE**2
    angle = jnp.sqrt(_safe(theta_sq, small))
    half = 0.5 * angle
    # sin(θ/2)/θ: exact vs Taylor 1/2 - θ²/48 + θ⁴/3840
    k_exact = jnp.sin(half) / angle
    k_taylor = 0.5 - theta_sq / 48.0 + theta_sq * theta_sq / 3840.0
    k = jnp.where(small, k_taylor, k_exact)
    w_exact = jnp.cos(half)
    w_taylor = 1.0 - theta_sq / 8.0 + theta_sq * theta_sq / 384.0
    w = jnp.where(small, w_taylor, w_exact)
    return jnp.concatenate([w[..., None], k[..., None] * theta], axis=-1)


def log(q):
    """SO(3) -> so(3): unit quaternion (...,4) wxyz -> rotation vector (...,3).

    Matches manif SO3::log(): angle reflected into (-pi, pi] when w < 0,
    small-angle branch returns 2*qv (manif SO3_base.h log()).
    """
    w = q[..., 0]
    qv = q[..., 1:4]
    sin_sq = jnp.sum(qv * qv, axis=-1)
    small = sin_sq < (0.5 * _SMALL_ANGLE) ** 2
    sin_angle = jnp.sqrt(_safe(sin_sq, small))
    # Reflect to the w >= 0 hemisphere: atan2(-s, -w) when w < 0.
    neg = w < 0
    two_angle = 2.0 * jnp.arctan2(
        jnp.where(neg, -sin_angle, sin_angle), jnp.where(neg, -w, w)
    )
    k_exact = two_angle / sin_angle
    # Small branch: 2*atan(s/w)/s = (2/w)(1 - (s/w)^2/3 + (s/w)^4/5 - ...);
    # with s < 5e-4 the truncation is ~1e-20 (manif's k=2/w alone is only
    # first-order and costs ~1e-7 relative at the branch boundary).
    w_safe = jnp.where(small, w, jnp.ones_like(w))
    r_sq = sin_sq / (w_safe * w_safe)
    k_taylor = (2.0 / w_safe) * (1.0 - r_sq / 3.0 + r_sq * r_sq / 5.0)
    k = jnp.where(small, k_taylor, k_exact)
    return k[..., None] * qv


# ---------------------------------------------------------------------------
# Jacobian coefficient helpers (shared with SE(3) layer)
# ---------------------------------------------------------------------------


def _ljac_coeffs(theta_sq):
    """Return (B, C) with Jl = I + B·W + C·W², W = hat(theta)."""
    small = theta_sq < _SMALL_ANGLE**2
    t2 = _safe(theta_sq, small)
    t = jnp.sqrt(t2)
    st, ct = jnp.sin(t), jnp.cos(t)
    b_exact = (1.0 - ct) / t2
    c_exact = (t - st) / (t2 * t)
    b_taylor = 0.5 - theta_sq / 24.0 + theta_sq * theta_sq / 720.0
    c_taylor = 1.0 / 6.0 - theta_sq / 120.0 + theta_sq * theta_sq / 5040.0
    return jnp.where(small, b_taylor, b_exact), jnp.where(small, c_taylor, c_exact)


def _ljacinv_coeff(theta_sq):
    """Return D with Jl⁻¹ = I - ½W + D·W²."""
    small = theta_sq < _SMALL_ANGLE**2
    t2 = _safe(theta_sq, small)
    t = jnp.sqrt(t2)
    st, ct = jnp.sin(t), jnp.cos(t)
    d_exact = 1.0 / t2 - (1.0 + ct) / (2.0 * t * st)
    d_taylor = 1.0 / 12.0 + theta_sq / 720.0 + theta_sq * theta_sq / 30240.0
    return jnp.where(small, d_taylor, d_exact)


def _ljac_coeffs_du(theta_sq):
    """(dB/du, dC/du) with u = |theta|² — derivatives of the Jl coefficient
    functions w.r.t. the SQUARED angle (B, C are analytic in u, so these are
    single-valued and branchless).

    Used by the analytic curvature primitives (`left_jacobian_t_jac`): the
    exact branches subtract two ~1/u² terms, so the Taylor window is WIDER
    than the value helpers' (u < 0.25, i.e. theta < 0.5 rad, with 4 terms —
    both branches agree to ~1e-12 f64 / ~3e-6 f32 at the crossover)."""
    small = theta_sq < 0.25
    t2 = _safe(theta_sq, small)
    t = jnp.sqrt(t2)
    st, ct = jnp.sin(t), jnp.cos(t)
    u = theta_sq
    # B = (1-cos t)/u:  B' = sin(t)/(2t³) - (1-cos t)/u²
    db_exact = (0.5 * t * st - (1.0 - ct)) / (t2 * t2)
    # C = (t-sin t)/t³:  C' = (1-cos t)/(2u²) - (3/2)(t-sin t)/t⁵
    dc_exact = (0.5 * (1.0 - ct) - 1.5 * (t - st) / t) / (t2 * t2)
    db_taylor = -1.0 / 24.0 + u / 360.0 - u * u / 13440.0 + u * u * u / 907200.0
    dc_taylor = (
        -1.0 / 120.0 + u / 2520.0 - u * u / 120960.0 + u * u * u / 9979200.0
    )
    return (
        jnp.where(small, db_taylor, db_exact),
        jnp.where(small, dc_taylor, dc_exact),
    )


def left_jacobian_t_jac(theta, w):
    """Jacobian of theta -> Jl_SO3(theta)ᵀ w, for a FIXED cotangent w:
    (...,3) x (...,3) -> (...,3,3) with [i,j] = ∂(Jlᵀw)_i/∂theta_j.

    Closed form (Jlᵀw = w - B·theta×w + C·theta×(theta×w), B/C the
    coefficient functions of u = |theta|²):

        D = B·ŵ - 2B'·(theta×w)thetaᵀ + 2C'·(theta×(theta×w))thetaᵀ
            - C·(hat(theta×w) + hat(theta)ŵ)

    This is the one genuinely new primitive behind the analytic DDP
    curvature (solver/ddp.py `vfxx_analytic`): the second differential of
    the exp chart, contracted with a value gradient. Verified against
    nested jax.jacfwd in tests/test_lie.py."""
    theta_sq = jnp.sum(theta * theta, axis=-1)
    b, c = _ljac_coeffs(theta_sq)
    db, dc = _ljac_coeffs_du(theta_sq)
    tw = jnp.cross(theta, w)
    ttw = jnp.cross(theta, tw)
    hw = hat(w)
    return (
        b[..., None, None] * hw
        - (2.0 * db)[..., None, None] * tw[..., :, None] * theta[..., None, :]
        + (2.0 * dc)[..., None, None] * ttw[..., :, None] * theta[..., None, :]
        - c[..., None, None] * (hat(tw) + hat(theta) @ hw)
    )


def _eye3(like):
    eye = jnp.eye(3, dtype=like.dtype)
    return jnp.broadcast_to(eye, like.shape[:-1] + (3, 3))


def left_jacobian(theta):
    """Jl(theta): (...,3) -> (...,3,3)."""
    theta_sq = jnp.sum(theta * theta, axis=-1)
    b, c = _ljac_coeffs(theta_sq)
    w = hat(theta)
    w2 = w @ w
    return _eye3(theta) + b[..., None, None] * w + c[..., None, None] * w2


def right_jacobian(theta):
    """Jr(theta) = Jl(-theta)."""
    return left_jacobian(-theta)


def left_jacobian_inv(theta):
    """Jl⁻¹(theta): (...,3) -> (...,3,3)."""
    theta_sq = jnp.sum(theta * theta, axis=-1)
    d = _ljacinv_coeff(theta_sq)
    w = hat(theta)
    w2 = w @ w
    return _eye3(theta) - 0.5 * w + d[..., None, None] * w2


def right_jacobian_inv(theta):
    """Jr⁻¹(theta) = Jl⁻¹(-theta)."""
    return left_jacobian_inv(-theta)
