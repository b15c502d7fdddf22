"""Parallel-in-time Riccati: the backward pass as an associative scan.

The reference's backward recursion is a strictly sequential dependence chain
over the horizon (ilqr.hh:109-141) — O(N) depth. This module reformulates it
as an associative combination of per-stage "conditional value function"
elements (Sarkka & Garcia-Fernandez, temporal parallelization of LQR —
PAPERS.md), giving O(log N) depth via `jax.lax.associative_scan`. It is the
SP/sequence-parallel equivalent called for in SURVEY.md §2.1: useful in the
latency-critical small-batch x long-horizon regime, where scenario
parallelism can't fill the chip.

Formulation (exact, not approximate): each LQR subproblem stage k has

    dx_{k+1} = J_x dx + J_u du
    cost_k    = c_x' dx + 1/2 dx' c_xx dx + c_u' du + 1/2 du' c_uu du

The linear terms are folded away by (a) completing the square in the control
(u_hat = du + c_uu^-1 c_u) and (b) augmenting the state with a constant
coordinate, x~ = [dx; 1]:

    A~ = [[J_x, -J_u c_uu^-1 c_u], [0, 1]]      (13 x 13)
    C~ = [[J_u c_uu^-1 J_u', 0], [0, 0]]
    X~ = [[c_xx, c_x], [c_x', 0]]

so each stage is a PURE LQR element e_k = (A~, C~, X~) with the conditional
value function V(x, z) = 1/2 x' J x + 1/2 (z - A x)' C^+ (z - A x) and the
associative combination (e_i earlier, e_j later; push-through identity keeps
everything in terms of one 13x13 solve):

    S  = I + C_i J_j
    A  = A_j S^-1 A_i
    C  = A_j S^-1 C_i A_j' + C_j
    J  = A_i' J_j S^-1 A_i + J_i

The suffix combine over [k, N) yields J~_k = the augmented value at stage k:
V_k(dx) = 1/2 dx' J11 dx + J12' dx. Per-stage gains are then recovered in
parallel with the standard Q-expansion — bit-comparable to the sequential
pass (f64 parity ~1e-8; the algebra differs, so not bit-identical).

Cost per combine is ~5 13x13 matmuls + one 13x13 LU solve: MORE total work
than the sequential scan, but log-depth — choose it when depth, not FLOPs,
bounds latency. Measured on one TPU v5e chip (single scenario, f32):
N=512: 28 vs 33 ms device time; N=2048: 40 vs 61 ms — and the per-combine
symmetrization keeps very deep f32 passes finite where the sequential
recursion overflows.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.linalg import chol_solve_small, chol_solve_vec, qr_solve_small
from . import ilqr as seq


def _stage_elements(j_x, j_u, c_x, c_u, c_xx, c_uu, quu_reg):
    """Per-stage (A~, C~, X~) with leading horizon axis N."""
    n = j_x.shape[0]
    dtype = j_x.dtype
    reg_eye = quu_reg * jnp.eye(c_uu.shape[-1], dtype=dtype)
    cuu = c_uu + reg_eye
    cuu_inv_cu = chol_solve_vec(cuu, c_u)  # (N, 4)
    cuu_inv_jut = chol_solve_small(cuu, jnp.swapaxes(j_u, -1, -2))  # (N, 4, 12)

    shift = -jnp.einsum("nij,nj->ni", j_u, cuu_inv_cu)  # (N, 12)
    a_aug = jnp.zeros((n, 13, 13), dtype)
    a_aug = a_aug.at[:, 0:12, 0:12].set(j_x)
    a_aug = a_aug.at[:, 0:12, 12].set(shift)
    a_aug = a_aug.at[:, 12, 12].set(1.0)

    c_aug = jnp.zeros((n, 13, 13), dtype)
    c_aug = c_aug.at[:, 0:12, 0:12].set(j_u @ cuu_inv_jut)

    x_aug = jnp.zeros((n, 13, 13), dtype)
    x_aug = x_aug.at[:, 0:12, 0:12].set(c_xx)
    x_aug = x_aug.at[:, 0:12, 12].set(c_x)
    x_aug = x_aug.at[:, 12, 0:12].set(c_x)
    return a_aug, c_aug, x_aug


def _combine(later, earlier):
    """Associative combination; operands carry leading batch dims.

    NOTE the argument order: `jax.lax.associative_scan(..., reverse=True)`
    passes the accumulated (later-in-time) suffix as the FIRST argument and
    the current (earlier) element second — verified against a manual
    right-fold; getting this backwards produces plausible-but-wrong values.
    """
    a_i, c_i, j_i = earlier
    a_j, c_j, j_j = later
    eye = jnp.eye(13, dtype=a_i.dtype)
    s = eye + c_i @ j_j
    # one unrolled Householder-QR factorization, both right-hand sides
    # (S is general/nonsymmetric — jnp.linalg.solve's pivoted LU is the
    # pattern this project bans on TPU, ops/linalg.py)
    sol = qr_solve_small(s, jnp.concatenate([a_i, c_i], axis=-1))
    sa = sol[..., :13]
    sc = sol[..., 13:]
    a = a_j @ sa
    c = a_j @ sc @ jnp.swapaxes(a_j, -1, -2) + c_j
    j = jnp.swapaxes(a_i, -1, -2) @ (j_j @ sa) + j_i
    # keep the quadratic forms numerically symmetric across log-depth combines
    c = 0.5 * (c + jnp.swapaxes(c, -1, -2))
    j = 0.5 * (j + jnp.swapaxes(j, -1, -2))
    return a, c, j


def backward_pass_assoc(params, cost, traj, dt_s, quu_reg=0.0, model=None):
    """Drop-in replacement for solver.ilqr.backward_pass with O(log N) depth.

    Same signature/returns: (ks (N,m), big_ks (N,m,12), qutk, ktquuk).
    Single scenario (leading axis = horizon); vmap for batches. `model`
    defaults to the quadrotor module (like solver.ilqr).
    """
    with jax.default_matmul_precision("highest"):
        if model is None:
            from ..models import quadrotor as model
        j_x, j_u, c_x, c_u, c_xx, c_uu = seq.quadratize(params, cost, traj, dt_s, model)
        elems = _stage_elements(j_x, j_u, c_x, c_u, c_xx, c_uu, quu_reg)
        suffix = jax.lax.associative_scan(_combine, elems, reverse=True, axis=0)
        j_suffix = suffix[2]  # (N, 13, 13); j_suffix[k] = augmented V_k

        # V_{k+1} per stage (V_N = 0)
        zero = jnp.zeros((1, 13, 13), j_suffix.dtype)
        v_next = jnp.concatenate([j_suffix[1:], zero], axis=0)
        v_xx = v_next[:, 0:12, 0:12]
        v_x = v_next[:, 0:12, 12]

        # standard Q-expansion + gain solve, all stages in parallel
        jut = jnp.swapaxes(j_u, -1, -2)
        jxt = jnp.swapaxes(j_x, -1, -2)
        q_u = c_u + jnp.einsum("nij,nj->ni", jut, v_x)
        vxx_ju = v_xx @ j_u
        q_uu = (
            c_uu
            + jut @ vxx_ju
            + quu_reg * jnp.eye(c_uu.shape[-1], dtype=j_x.dtype)
        )
        q_xu = jxt @ vxx_ju
        rhs = jnp.concatenate([q_u[..., None], jnp.swapaxes(q_xu, -1, -2)], axis=-1)
        sol = -chol_solve_small(q_uu, rhs)
        ks = sol[..., 0]
        big_ks = sol[..., 1:]
        quu_k = jnp.einsum("nij,nj->ni", q_uu, ks)
        qutk = jnp.sum(q_u * ks)
        ktquuk = jnp.sum(ks * quu_k)
        return ks, big_ks, qutk, ktquuk
