"""Lane-layout small-matrix / Lie-group math for Pallas TPU kernels.

Everything here operates on arrays whose MINOR-MOST axis is the scenario
batch tile (lane dim, typically 128): lane-scalars are (1, B), vectors
(d, B), matrices (r, c, B). All loops over the small dims (3/4/6/12) unroll
at trace time into straight-line VPU code; no data-dependent control flow.

The math mirrors quadrotorilqr_tpu/lie/{so3,se3}.py exactly (same manif
conventions and small-angle Taylor branches — see those modules for the
reference citations); only the data layout differs. Keep the two in sync.

Shared (lane-less) quantities — cost weights Q/R, inertia, moment arms —
enter pre-broadcast to a 128-lane tile by the host wrappers
(kernels/backward.py `_bcast_tile` / `_prep_cost`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_SMALL_ANGLE = 1e-3


# ---------------------------------------------------------------------------
# generic (r, c, B) matrix ops
# ---------------------------------------------------------------------------


def row(m, i):
    """Row i of (r, c, B) -> (c, B)."""
    return jax.lax.index_in_dim(m, i, 0, keepdims=False)


def col(m, j):
    """Column j of (r, c, B) -> (r, B)."""
    return jax.lax.index_in_dim(m, j, 1, keepdims=False)


def matmul(a, b):
    """(r, k, B) @ (k, c, B) -> (r, c, B); unrolled over k."""
    out = None
    for i in range(a.shape[1]):
        term = jnp.expand_dims(col(a, i), 1) * jnp.expand_dims(row(b, i), 0)
        out = term if out is None else out + term
    return out


def matvec(m, v):
    """(r, k, B) @ (k, B) -> (r, B)."""
    out = None
    for i in range(m.shape[1]):
        term = col(m, i) * v[i : i + 1, :]
        out = term if out is None else out + term
    return out


def transpose(m):
    """(r, c, B) -> (c, r, B)."""
    return jnp.swapaxes(m, 0, 1)


def eye(n, like):
    """(n, n, ...B) identity broadcast over lanes.

    `like` must be a lane VECTOR — (d, ...B) — whose trailing dims are the
    batch shape: (B,) in the minor-lane layout, (8, 128) in the supertile
    layout. The rest of this module is trailing-shape agnostic; this is
    the one helper that materializes a batch shape, and a vector reference
    is the only rank-unambiguous way to name it (a matrix (r, c, B) and a
    supertile vector (d, 8, 128) have the same rank)."""
    bshape = like.shape[1:]
    shape = (n, n) + bshape
    # broadcasted_iota + float select, not reshape(jnp.eye(n)): Mosaic's
    # layout inference rejects the rank-raising shape cast of a 2-D
    # constant inside supertile (4-D) kernels ("unsupported shape cast"),
    # and a bool-valued branch select would hit the i8->i1 truncation it
    # cannot lower — selecting between FLOAT operands lowers everywhere.
    r = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    c = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    return jnp.where(
        r == c,
        jnp.ones(shape, like.dtype),
        jnp.zeros(shape, like.dtype),
    )


def block2x2(a, b, c, d):
    """[[a, b], [c, d]] blocks (each (·,·,B)) -> assembled matrix."""
    top = jnp.concatenate([a, b], axis=1)
    bot = jnp.concatenate([c, d], axis=1)
    return jnp.concatenate([top, bot], axis=0)


def dot_lanes(u, v):
    """Per-lane dot product: (d, B), (d, B) -> (1, B)."""
    return jnp.sum(u * v, axis=0, keepdims=True)


def cross(a, b):
    """Per-lane cross product: (3, B) x (3, B) -> (3, B)."""
    a0, a1, a2 = a[0:1], a[1:2], a[2:3]
    b0, b1, b2 = b[0:1], b[1:2], b[2:3]
    return jnp.concatenate(
        [a1 * b2 - a2 * b1, a2 * b0 - a0 * b2, a0 * b1 - a1 * b0], axis=0
    )


def diag3(v):
    """(3, B) -> diagonal (3, 3, B)."""
    x, y, z = v[0:1], v[1:2], v[2:3]
    zero = jnp.zeros_like(x)
    r0 = jnp.stack([x[0], zero[0], zero[0]], axis=0)
    r1 = jnp.stack([zero[0], y[0], zero[0]], axis=0)
    r2 = jnp.stack([zero[0], zero[0], z[0]], axis=0)
    return jnp.stack([r0, r1, r2], axis=0)


def hat(v):
    """(3, B) -> skew (3, 3, B)."""
    x, y, z = v[0:1], v[1:2], v[2:3]
    zero = jnp.zeros_like(x)
    r0 = jnp.stack([zero[0], -z[0], y[0]], axis=0)
    r1 = jnp.stack([z[0], zero[0], -x[0]], axis=0)
    r2 = jnp.stack([-y[0], x[0], zero[0]], axis=0)
    return jnp.stack([r0, r1, r2], axis=0)


# ---------------------------------------------------------------------------
# small SPD Cholesky solve, unrolled (mirrors ops/linalg.py in lane layout)
# ---------------------------------------------------------------------------


def chol_solve(a, b):
    """Solve a @ x = b with a (n, n, B) SPD, b (n, k, B) -> (n, k, B).

    n is read from the operands and the elimination unrolls at trace time
    into straight-line VPU code — used at n=4 (quadrotor Quu) and n=6
    (SE(3)-wrench Quu, kernels/models.py)."""
    n = a.shape[0]
    l = [[None] * n for _ in range(n)]
    for j in range(n):
        s = a[j, j][None]  # (1, B)
        for kk in range(j):
            s = s - l[j][kk] * l[j][kk]
        d = jnp.sqrt(s)
        l[j][j] = d
        inv_d = 1.0 / d
        for i in range(j + 1, n):
            s = a[i, j][None]
            for kk in range(j):
                s = s - l[i][kk] * l[j][kk]
            l[i][j] = s * inv_d
    # forward substitution: L y = b, rows of y are (k, B)
    ys = []
    for i in range(n):
        s = row(b, i)
        for j in range(i):
            s = s - l[i][j] * ys[j]
        ys.append(s / l[i][i])
    # back substitution: L^T x = y
    xs = [None] * n
    for i in reversed(range(n)):
        s = ys[i]
        for j in range(i + 1, n):
            s = s - l[j][i] * xs[j]
        xs[i] = s / l[i][i]
    return jnp.stack(xs, axis=0)


chol_solve4 = chol_solve  # historical alias (original 4x4-only form)


# ---------------------------------------------------------------------------
# SO(3) on (4, B) wxyz quaternions / (3, B) rotation vectors
# ---------------------------------------------------------------------------


def _safe(x, small):
    return jnp.where(small, jnp.ones_like(x), x)


def quat_conjugate(q):
    return jnp.concatenate([q[0:1], -q[1:4]], axis=0)


def quat_multiply(a, b):
    aw, ax, ay, az = a[0:1], a[1:2], a[2:3], a[3:4]
    bw, bx, by, bz = b[0:1], b[1:2], b[2:3], b[3:4]
    return jnp.concatenate(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=0,
    )


def quat_rotate(q, v):
    """Rotate (3, B) by quaternions (4, B)."""
    qw = q[0:1]
    qv = q[1:4]
    t = 2.0 * cross(qv, v)
    return v + qw * t + cross(qv, t)


def quat_to_matrix(q):
    w, x, y, z = q[0], q[1], q[2], q[3]
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    one = jnp.ones_like(w)
    r0 = jnp.stack([one - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], axis=0)
    r1 = jnp.stack([2 * (xy + wz), one - 2 * (xx + zz), 2 * (yz - wx)], axis=0)
    r2 = jnp.stack([2 * (xz - wy), 2 * (yz + wx), one - 2 * (xx + yy)], axis=0)
    return jnp.stack([r0, r1, r2], axis=0)


def so3_exp(theta):
    """(3, B) rotation vector -> (4, B) quaternion (lie/so3.py exp)."""
    theta_sq = dot_lanes(theta, theta)
    small = theta_sq < _SMALL_ANGLE**2
    angle = jnp.sqrt(_safe(theta_sq, small))
    half = 0.5 * angle
    k_exact = jnp.sin(half) / angle
    k_taylor = 0.5 - theta_sq / 48.0 + theta_sq * theta_sq / 3840.0
    k = jnp.where(small, k_taylor, k_exact)
    w_exact = jnp.cos(half)
    w_taylor = 1.0 - theta_sq / 8.0 + theta_sq * theta_sq / 384.0
    w = jnp.where(small, w_taylor, w_exact)
    return jnp.concatenate([w, k * theta], axis=0)


def atan(z):
    """Elementwise arctangent — Mosaic TPU has no atan/atan2 primitive.

    Range-reduce |z| to [0, 1] via the reciprocal identity, then half-angle
    reductions atan(x) = 2 atan(x / (1 + sqrt(1 + x^2))) shrink the argument
    until an odd Taylor series reaches the dtype's epsilon:
      f64: 3 reductions (arg < tan(pi/32) ~ 0.0985) + terms to x^13 -> ~6e-17
      f32: 2 reductions (arg < tan(pi/16) ~ 0.199)  + terms to x^9  -> ~6e-9
    """
    dtype = z.dtype
    f64 = dtype == jnp.float64
    half_pi = jnp.asarray(jnp.pi / 2, dtype)
    t = jnp.abs(z)
    big = t > 1.0
    x = jnp.where(big, 1.0 / jnp.where(big, t, jnp.ones_like(t)), t)
    reductions = 3 if f64 else 2
    for _ in range(reductions):
        x = x / (1.0 + jnp.sqrt(1.0 + x * x))
    x2 = x * x
    if f64:
        p = x * (
            1.0
            + x2
            * (
                -1.0 / 3.0
                + x2
                * (
                    1.0 / 5.0
                    + x2
                    * (-1.0 / 7.0 + x2 * (1.0 / 9.0 + x2 * (-1.0 / 11.0 + x2 / 13.0)))
                )
            )
        )
    else:
        p = x * (
            1.0
            + x2 * (-1.0 / 3.0 + x2 * (1.0 / 5.0 + x2 * (-1.0 / 7.0 + x2 / 9.0)))
        )
    p = float(2**reductions) * p
    p = jnp.where(big, half_pi - p, p)
    return jnp.where(z < 0, -p, p)


def atan2(y, x):
    """Elementwise atan2 built on `atan` (same quadrant conventions)."""
    dtype = y.dtype
    pi = jnp.asarray(jnp.pi, dtype)
    x_zero = x == 0
    a = atan(y / jnp.where(x_zero, jnp.ones_like(x), x))
    a = jnp.where(x_zero, jnp.where(y < 0, -pi / 2, pi / 2), a)
    return jnp.where(x < 0, a + jnp.where(y < 0, -pi, pi), a)


def so3_log(q):
    """(4, B) quaternion -> (3, B) rotation vector (lie/so3.py log)."""
    w = q[0:1]
    qv = q[1:4]
    sin_sq = dot_lanes(qv, qv)
    small = sin_sq < (0.5 * _SMALL_ANGLE) ** 2
    sin_angle = jnp.sqrt(_safe(sin_sq, small))
    neg = w < 0
    two_angle = 2.0 * atan2(
        jnp.where(neg, -sin_angle, sin_angle), jnp.where(neg, -w, w)
    )
    k_exact = two_angle / sin_angle
    w_safe = jnp.where(small, w, jnp.ones_like(w))
    r_sq = sin_sq / (w_safe * w_safe)
    k_taylor = (2.0 / w_safe) * (1.0 - r_sq / 3.0 + r_sq * r_sq / 5.0)
    k = jnp.where(small, k_taylor, k_exact)
    return k * qv


def _ljac_coeffs(theta_sq):
    """(B, C) with Jl = I + B W + C W^2 (lie/so3.py _ljac_coeffs)."""
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
    small = theta_sq < _SMALL_ANGLE**2
    t2 = _safe(theta_sq, small)
    t = jnp.sqrt(t2)
    st, ct = jnp.sin(t), jnp.cos(t)
    d_exact = 1.0 / t2 - (1.0 + ct) / (2.0 * t * st)
    d_taylor = 1.0 / 12.0 + theta_sq / 720.0 + theta_sq * theta_sq / 30240.0
    return jnp.where(small, d_taylor, d_exact)


def so3_left_jacobian(theta):
    """(3, B) -> (3, 3, B)."""
    theta_sq = dot_lanes(theta, theta)
    b, c = _ljac_coeffs(theta_sq)
    w = hat(theta)
    w2 = matmul(w, w)
    return eye(3, theta) + b[None] * w + c[None] * w2


def so3_left_jacobian_inv(theta):
    theta_sq = dot_lanes(theta, theta)
    d = _ljacinv_coeff(theta_sq)
    w = hat(theta)
    w2 = matmul(w, w)
    return eye(3, theta) - 0.5 * w + d[None] * w2


# ---------------------------------------------------------------------------
# SE(3): tangent (6, B) = [lin(3), ang(3)]; group = (quat (4,B), trans (3,B))
# ---------------------------------------------------------------------------


def se3_exp(tau):
    """(6, B) -> (quat (4,B), trans (3,B)) (lie/se3.py exp)."""
    rho, theta = tau[0:3], tau[3:6]
    v = so3_left_jacobian(theta)
    return so3_exp(theta), matvec(v, rho)


def se3_log(quat, trans):
    """(quat, trans) -> (6, B) (lie/se3.py log)."""
    theta = so3_log(quat)
    vinv = so3_left_jacobian_inv(theta)
    rho = matvec(vinv, trans)
    return jnp.concatenate([rho, theta], axis=0)


def se3_multiply(qa, ta, qb, tb):
    return quat_multiply(qa, qb), ta + quat_rotate(qa, tb)


def se3_inverse(q, t):
    qinv = quat_conjugate(q)
    return qinv, -quat_rotate(qinv, t)


def se3_adjoint(q, t):
    """Adj in [lin, ang] block order: [[R, hat(t)R], [0, R]] -> (6, 6, B)."""
    r = quat_to_matrix(q)
    tr = matmul(hat(t), r)
    zero = jnp.zeros_like(r)
    return block2x2(r, tr, zero, r)


def se3_q_matrix(tau):
    """Barfoot Q-matrix (lie/se3.py _q_matrix) -> (3, 3, B)."""
    rho, theta = tau[0:3], tau[3:6]
    theta_sq = dot_lanes(theta, theta)
    small = theta_sq < _SMALL_ANGLE**2
    t2 = _safe(theta_sq, small)
    t = jnp.sqrt(t2)
    st, ct = jnp.sin(t), jnp.cos(t)

    b_exact = (t - st) / (t2 * t)
    c_exact = (1.0 - 0.5 * t2 - ct) / (t2 * t2)
    e_exact = (t - st - t2 * t / 6.0) / (t2 * t2 * t)
    b_taylor = 1.0 / 6.0 - theta_sq / 120.0 + theta_sq * theta_sq / 5040.0
    c_taylor = -1.0 / 24.0 + theta_sq / 720.0 - theta_sq * theta_sq / 40320.0
    e_taylor = -1.0 / 120.0 + theta_sq / 5040.0 - theta_sq * theta_sq / 362880.0

    b = jnp.where(small, b_taylor, b_exact)[None]
    c = jnp.where(small, c_taylor, c_exact)[None]
    e = jnp.where(small, e_taylor, e_exact)[None]
    d = c - 3.0 * e

    v = hat(rho)
    w = hat(theta)
    vw = matmul(v, w)
    wv = matmul(w, v)
    wvw = matmul(wv, w)
    vww = matmul(vw, w)
    wwv = matmul(w, wv)

    return (
        0.5 * v
        + b * (wv + vw + wvw)
        - c * (wwv + vww - 3.0 * wvw)
        - 0.5 * d * (matmul(wvw, w) + matmul(w, wvw))
    )


def se3_right_jacobian(tau):
    """Jr_SE3(tau) = Jl_SE3(-tau) -> (6, 6, B)."""
    ntau = -tau
    theta = ntau[3:6]
    jl = so3_left_jacobian(theta)
    q = se3_q_matrix(ntau)
    zero = jnp.zeros_like(jl)
    return block2x2(jl, q, zero, jl)


def se3_right_jacobian_inv(tau):
    """Jr_SE3(tau)^-1 = Jl_SE3(-tau)^-1 -> (6, 6, B)."""
    ntau = -tau
    theta = ntau[3:6]
    jlinv = so3_left_jacobian_inv(theta)
    q = se3_q_matrix(ntau)
    zero = jnp.zeros_like(jlinv)
    return block2x2(jlinv, -matmul(matmul(jlinv, q), jlinv), zero, jlinv)


def se3_left_jacobian_inv(tau):
    theta = tau[3:6]
    jlinv = so3_left_jacobian_inv(theta)
    q = se3_q_matrix(tau)
    zero = jnp.zeros_like(jlinv)
    return block2x2(jlinv, -matmul(matmul(jlinv, q), jlinv), zero, jlinv)


# ---------------------------------------------------------------------------
# analytic D[Jᵀw] curvature primitives (lie/{so3,se3}.py *_jacobian_t_jac in
# lane layout — the exp chart's second differential contracted with a fixed
# cotangent; foundation of the kernel-side exact-DDP curvature)
# ---------------------------------------------------------------------------


def _ljac_coeffs_du(theta_sq):
    """(dB/du, dC/du), u = |theta|² (lie/so3.py _ljac_coeffs_du: widened
    u < 0.25 Taylor window — the exact branches cancel ~1/u² terms)."""
    small = theta_sq < 0.25
    t2 = _safe(theta_sq, small)
    t = jnp.sqrt(t2)
    st, ct = jnp.sin(t), jnp.cos(t)
    u = theta_sq
    db_exact = (0.5 * t * st - (1.0 - ct)) / (t2 * t2)
    dc_exact = (0.5 * (1.0 - ct) - 1.5 * (t - st) / t) / (t2 * t2)
    db_taylor = -1.0 / 24.0 + u / 360.0 - u * u / 13440.0 + u * u * u / 907200.0
    dc_taylor = (
        -1.0 / 120.0 + u / 2520.0 - u * u / 120960.0 + u * u * u / 9979200.0
    )
    return (
        jnp.where(small, db_taylor, db_exact),
        jnp.where(small, dc_taylor, dc_exact),
    )


def _outer(vec, other):
    """Per-lane outer product: (r, B) x (c, B) -> (r, c, B)."""
    return jnp.expand_dims(vec, 1) * jnp.expand_dims(other, 0)


def so3_left_jacobian_t_jac(theta, w):
    """D_theta[Jl_SO3(theta)ᵀ w] (lie/so3.py left_jacobian_t_jac):
    (3, B) x (3, B) -> (3, 3, B)."""
    theta_sq = dot_lanes(theta, theta)
    b, c = _ljac_coeffs(theta_sq)
    db, dc = _ljac_coeffs_du(theta_sq)
    tw = cross(theta, w)
    ttw = cross(theta, tw)
    hw = hat(w)
    return (
        b[None] * hw
        - (2.0 * db)[None] * _outer(tw, theta)
        + (2.0 * dc)[None] * _outer(ttw, theta)
        - c[None] * (hat(tw) + matmul(hat(theta), hw))
    )


def _q_coeffs_du(theta_sq):
    """(db/du, dc/du, de/du) for the Q-matrix coefficients
    (lie/se3.py _q_coeffs_du; same widened Taylor window)."""
    small = theta_sq < 0.25
    t2 = _safe(theta_sq, small)
    t = jnp.sqrt(t2)
    st, ct = jnp.sin(t), jnp.cos(t)
    u = theta_sq
    u2 = t2 * t2
    db_exact = (0.5 * (1.0 - ct) - 1.5 * (t - st) / t) / u2
    c_num = 1.0 - 0.5 * t2 - ct
    dc_exact = (0.5 * st / t - 0.5) / u2 - 2.0 * c_num / (u2 * t2)
    e_num = t - st - t2 * t / 6.0
    de_exact = ((1.0 - ct) / (2.0 * t) - 0.25 * t) / (u2 * t) - 2.5 * e_num / (
        u2 * t2 * t
    )
    db_taylor = (
        -1.0 / 120.0 + u / 2520.0 - u * u / 120960.0 + u * u * u / 9979200.0
    )
    dc_taylor = (
        1.0 / 720.0 - u / 20160.0 + u * u / 1209600.0 - u * u * u / 119750400.0
    )
    de_taylor = (
        1.0 / 5040.0
        - u / 181440.0
        + u * u / 13305600.0
        - u * u * u / 1556755200.0
    )
    return (
        jnp.where(small, db_taylor, db_exact),
        jnp.where(small, dc_taylor, dc_exact),
        jnp.where(small, de_taylor, de_exact),
    )


def _se3_q_t_jacs(tau, w):
    """(D_rho[Qᵀw], D_theta[Qᵀw]) (lie/se3.py _q_t_jacs in lane layout):
    each (3, 3, B)."""
    rho, theta = tau[0:3], tau[3:6]
    theta_sq = dot_lanes(theta, theta)
    small = theta_sq < _SMALL_ANGLE**2
    t2 = _safe(theta_sq, small)
    t = jnp.sqrt(t2)
    st, ct = jnp.sin(t), jnp.cos(t)
    b_exact = (t - st) / (t2 * t)
    c_exact = (1.0 - 0.5 * t2 - ct) / (t2 * t2)
    e_exact = (t - st - t2 * t / 6.0) / (t2 * t2 * t)
    b_taylor = 1.0 / 6.0 - theta_sq / 120.0 + theta_sq * theta_sq / 5040.0
    c_taylor = -1.0 / 24.0 + theta_sq / 720.0 - theta_sq * theta_sq / 40320.0
    e_taylor = -1.0 / 120.0 + theta_sq / 5040.0 - theta_sq * theta_sq / 362880.0
    b = jnp.where(small, b_taylor, b_exact)[None]
    c = jnp.where(small, c_taylor, c_exact)[None]
    d = c - 3.0 * jnp.where(small, e_taylor, e_exact)[None]
    db_u, dc_u, de_u = _q_coeffs_du(theta_sq)
    dd_u = dc_u - 3.0 * de_u

    v = hat(rho)
    w_m = hat(theta)
    ww = matmul(w_m, w_m)
    wv = matmul(w_m, v)
    vw = matmul(v, w_m)
    wvw = matmul(wv, w_m)

    h0 = hat(w)
    ww_v = matvec(w_m, w)
    w2w = matvec(ww, w)
    vw_v = matvec(v, w)
    vww_v = matvec(vw, w)
    wvw_v = matvec(wv, w)
    wvww_v = matvec(wvw, w)
    vw2w_v = matvec(matmul(v, ww), w)
    h1 = hat(ww_v)
    h2 = hat(w2w)
    p1 = hat(vw_v)
    h_vw = hat(vww_v)
    h_wv = hat(wvw_v)
    h_wvw = hat(wvww_v)
    h_vww = hat(vw2w_v)

    d_rho = (
        0.5 * h0
        + b * (-h1 - matmul(w_m, h0) + matmul(w_m, h1))
        - c * (h2 + matmul(ww, h0) - 3.0 * matmul(w_m, h1))
        + 0.5 * d * (matmul(ww, h1) + matmul(w_m, h2))
    )

    mat_b = -matmul(v, h0) - p1 + matmul(wv, h0) + h_vw
    mat_c = (
        matmul(vw, h0)
        + matmul(v, h1)
        + matmul(w_m, p1)
        + h_wv
        - 3.0 * (matmul(wv, h0) + h_vw)
    )
    mat_d = (
        matmul(ww, matmul(v, h0))
        + matmul(w_m, h_vw)
        + h_wvw
        + matmul(wvw, h0)
        + matmul(wv, h1)
        + h_vww
    )
    vb = vww_v + wvw_v - wvww_v
    vc = -matvec(matmul(v, ww), w) - matvec(matmul(ww, v), w) + 3.0 * wvww_v
    vd = matvec(matmul(ww, vw), w) + matvec(matmul(w_m, matmul(v, ww)), w)

    d_theta = (
        b * mat_b
        - c * mat_c
        + 0.5 * d * mat_d
        + (2.0 * db_u)[None] * _outer(vb, theta)
        - (2.0 * dc_u)[None] * _outer(vc, theta)
        - dd_u[None] * _outer(vd, theta)
    )
    return d_rho, d_theta


def se3_left_jacobian_t_jac(tau, w):
    """D_tau[Jl_SE3(tau)ᵀ w] (lie/se3.py left_jacobian_t_jac):
    (6, B) x (6, B) -> (6, 6, B)."""
    theta = tau[3:6]
    w_r, w_t = w[0:3], w[3:6]
    top_t = so3_left_jacobian_t_jac(theta, w_r)
    dq_r, dq_t = _se3_q_t_jacs(tau, w_r)
    bot_t = dq_t + so3_left_jacobian_t_jac(theta, w_t)
    zero = jnp.zeros_like(top_t)
    return block2x2(zero, top_t, dq_r, bot_t)


def se3_right_jacobian_t_jac(tau, w):
    """D_tau[Jr_SE3(tau)ᵀ w] = -D[Jlᵀw](-tau) (lie/se3.py)."""
    return -se3_left_jacobian_t_jac(-tau, w)
