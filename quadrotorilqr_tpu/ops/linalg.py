"""Unrolled small-matrix SPD solves.

`jnp.linalg.solve` lowers to pivoted LU on TPU — sequential pivoting loops
that are catastrophic inside `lax.scan` bodies (hundreds of seconds of XLA
compile and ~ms per step for the 3x3/4x4 systems this engine needs). The
systems here are tiny and SPD (the 3x3 inertia, quadrotor_model.cc:20, which
the reference LLT-factorizes; the 4x4 Quu which it LDLT-factorizes,
ilqr.hh:126), so the TPU-native answer is a fully unrolled Cholesky: ~n^3/3
fused multiply-adds, n sqrts, no data-dependent control flow, compiles to
straight-line vector code that XLA fuses into the surrounding scan body.

All functions broadcast over arbitrary leading batch dims.
"""

from __future__ import annotations

import jax.numpy as jnp


def cholesky_small(a):
    """Lower Cholesky factor of a small SPD matrix (..., n, n), unrolled.

    n is read from the static shape; the loops below unroll at trace time
    into straight-line code (no lax control flow).
    """
    n = a.shape[-1]
    l = [[None] * n for _ in range(n)]
    for j in range(n):
        s = a[..., j, j]
        for k in range(j):
            s = s - l[j][k] * l[j][k]
        d = jnp.sqrt(s)
        l[j][j] = d
        inv_d = 1.0 / d
        for i in range(j + 1, n):
            s = a[..., i, j]
            for k in range(j):
                s = s - l[i][k] * l[j][k]
            l[i][j] = s * inv_d
    zero = jnp.zeros_like(a[..., 0, 0])
    rows = [
        jnp.stack([l[i][j] if j <= i else zero for j in range(n)], axis=-1)
        for i in range(n)
    ]
    return jnp.stack(rows, axis=-2)


def _solve_lower(l, b):
    """L y = b with L (..., n, n) lower-triangular, b (..., n, k); unrolled."""
    n = l.shape[-1]
    ys = []
    for i in range(n):
        s = b[..., i, :]
        for j in range(i):
            s = s - l[..., i, j, None] * ys[j]
        ys.append(s / l[..., i, i, None])
    return jnp.stack(ys, axis=-2)


def _solve_upper_t(l, y):
    """L^T x = y (L lower-triangular), unrolled back-substitution."""
    n = l.shape[-1]
    xs = [None] * n
    for i in reversed(range(n)):
        s = y[..., i, :]
        for j in range(i + 1, n):
            s = s - l[..., j, i, None] * xs[j]
        xs[i] = s / l[..., i, i, None]
    return jnp.stack(xs, axis=-2)


def chol_solve_small(a, b):
    """Solve a @ x = b for small SPD a (..., n, n) and matrix b (..., n, k).

    Batch dims broadcast (either side may be unbatched). Equivalent to
    `jnp.linalg.solve` for SPD systems but compiles to straight-line fused
    code on TPU. For a vector rhs use `chol_solve_vec`.
    """
    batch = jnp.broadcast_shapes(a.shape[:-2], b.shape[:-2])
    a = jnp.broadcast_to(a, batch + a.shape[-2:])
    b = jnp.broadcast_to(b, batch + b.shape[-2:])
    l = cholesky_small(a)
    return _solve_upper_t(l, _solve_lower(l, b))


def chol_solve_vec(a, b):
    """Solve a @ x = b for small SPD a (..., n, n) and vector b (..., n)."""
    return chol_solve_small(a, b[..., None])[..., 0]


def qr_solve_small(a, b):
    """Solve a @ x = b for a small GENERAL (non-symmetric) a (..., n, n) and
    b (..., n, k) via Householder QR with NO pivoting.

    The TPU-safe replacement for `jnp.linalg.solve` on small general
    systems (the associative-Riccati combine's I + C J blocks,
    solver/parallel_riccati.py): Householder is backward stable without
    pivoting, so there is no argmax/row-swap gather chain. The column loop
    is a `fori_loop` whose body uses one-hot contractions on whole
    matrices — a tiny constant-size graph, safe to embed in scan /
    associative_scan bodies (a fully unrolled variant multiplies its
    ~10^3-node graph into every level of an associative scan and explodes
    compile time). A structurally zero column (beta == 0) skips its
    reflector instead of dividing by zero."""
    import jax

    n = a.shape[-1]
    dtype = a.dtype
    batch = jnp.broadcast_shapes(a.shape[:-2], b.shape[:-2])
    a = jnp.broadcast_to(a, batch + a.shape[-2:])
    b = jnp.broadcast_to(b, batch + b.shape[-2:])
    idx = jnp.arange(n)

    def reflect(j, carry):
        r, y = carry
        oh = (idx == j).astype(dtype)  # (n,)
        low = (idx >= j).astype(dtype)
        col = jnp.einsum("...ic,c->...i", r, oh) * low  # column j, rows >= j
        rjj = jnp.einsum("...i,i->...", col, oh)
        norm = jnp.sqrt(jnp.sum(col * col, axis=-1))
        alpha = jnp.where(rjj >= 0, -norm, norm)  # anti-cancellation sign
        v = col - alpha[..., None] * oh
        beta = jnp.sum(v * v, axis=-1)
        scale = jnp.where(beta > 0, 2.0 / jnp.where(beta > 0, beta, 1.0), 0.0)
        vr = jnp.einsum("...i,...ic->...c", v, r)
        r = r - scale[..., None, None] * v[..., :, None] * vr[..., None, :]
        vy = jnp.einsum("...i,...ic->...c", v, y)
        y = y - scale[..., None, None] * v[..., :, None] * vy[..., None, :]
        return r, y

    r, y = jax.lax.fori_loop(0, n, reflect, (a, b))

    def back_sub(step, x):
        i = n - 1 - step
        oh = (idx == i).astype(dtype)
        upper = (idx > i).astype(dtype)
        ri = jnp.einsum("...ic,i->...c", r, oh)  # row i of R
        rii = jnp.einsum("...c,c->...", ri, oh)
        yi = jnp.einsum("...ic,i->...c", y, oh)  # row i of the rhs block
        rx = jnp.einsum("...c,...ck->...k", ri * upper, x)
        xi = (yi - rx) / rii[..., None]
        return x + oh[..., :, None] * xi[..., None, :]

    x0 = jnp.zeros_like(b)
    return jax.lax.fori_loop(0, n, back_sub, x0)
