"""Fused Pallas rollout: closed-loop forward simulation + trajectory cost.

One kernel invocation rolls a 128-scenario lane tile forward through the
whole horizon (ilqr.hh:149-172) with per-lane line-search step sizes, and
accumulates the tracking cost of the produced trajectory (ilqr.hh:89-95,
cost.hh:47-48) in the same sweep — the line search's rollout+cost round trip
(ilqr.hh:178-190) becomes a single kernel launch.

    u_n   = u_old_n + alpha * k_n + K_n (x (-) x_old_n)
    x_{n+1} = f(x_n, u_n)                     (Lie-Euler, quadrotor_model.cc:33-49)
    J    += (x_n (-) x_d_n)' Q (x_n (-) x_d_n) + (u_n - u_d_n)' R (u_n - u_d_n)

Same scope as backward.py: physical params, cost weights, and the desired
trajectory may each be shared across the batch or per-scenario.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import lanes as L
from .backward import TILE, _prep_cost, _to_lanes


def _state_minus(q1, t1, v1, q2, t2, v2):
    """12-tangent lhs (-) rhs in lane layout (quadrotor_model.cc:215-219)."""
    qd_inv, td_inv = L.se3_inverse(q2, t2)
    qr, tr = L.se3_multiply(qd_inv, td_inv, q1, t1)
    tau = L.se3_log(qr, tr)
    return jnp.concatenate([tau, v1 - v2], axis=0)


def _dynamics_step(dt, g, m_inv, iinv_ma, i_l, iinv_l, ez, quat, trans, vel, u):
    """One Lie-Euler step of the quadrotor dynamics in lane layout
    (quadrotor_model.cc:65-79 continuous dynamics + cc:266-277 Euler step).
    Returns (quat', trans', vel'). `g`/`m_inv` are (1, b) lane rows."""
    r_t_ez = L.quat_rotate(L.quat_conjugate(quat), ez)
    acc_lin = -g * r_t_ez + (jnp.sum(u, axis=0, keepdims=True) * m_inv) * ez
    omega = vel[3:6]
    i_omega = L.matvec(i_l, omega)
    acc_ang = L.matvec(iinv_ma, u) - L.matvec(iinv_l, L.cross(omega, i_omega))
    tau = dt * vel
    qe, te = L.se3_exp(tau)
    quat_next, trans_next = L.se3_multiply(quat, trans, qe, te)
    vel_next = vel + dt * jnp.concatenate([acc_lin, acc_ang], axis=0)
    return quat_next, trans_next, vel_next


def _rollout_kernel(
    n_stages,
    dynamics_step,  # lane-layout model step (kernels/models.py)
    use_box,  # static: clamp controls into [lo, hi] (control limits)
    use_weights,  # static: per-stage cost weights active (w_ref read)
    scal_ref,  # SMEM (4,): [dt, 0, 0, 0]
    act_ref,  # SMEM (n_tiles,) i32: per-tile any-lane-pending flags
    q_ref,  # (N, 4, Bt) old state quats
    t_ref,
    v_ref,
    u_ref,  # (N, u, Bt)
    ks_ref,  # (N, u, Bt)
    bigks_ref,  # (N, u, 12, Bt)
    alpha_ref,  # (1, Bt) per-lane step size
    dq_ref,  # desired (broadcast tile or per-lane)
    dt_ref,
    dv_ref,
    du_ref,
    qmat_ref,  # (12, 12, Bt) cost Q
    rmat_ref,  # (u, u, Bt) cost R
    w_ref,  # (N, 1, Bt) stage weights ((1, 1, Bt) dummy when !use_weights)
    g_ref,  # (1, 1, Bt) gravity (broadcast or per-lane)
    minv_ref,  # (1, 1, Bt) 1/mass
    extra_ref,  # per-model operand (quadrotor: (3, u, Bt) I^-1 @ moment_arms)
    i_ref,  # (3, 3, Bt)
    iinv_ref,  # (3, 3, Bt)
    lo_ref,  # (u, Bt) control lower bounds ((1, Bt) dummy when !use_box)
    hi_ref,  # (u, Bt) upper bounds
    oq_ref,  # out (N, 4, Bt) new state quats
    ot_ref,
    ov_ref,
    ou_ref,
    cost_ref,  # out (1, Bt)
):
    # all-lanes-idle tiles (nothing pending in this line-search trip) skip
    # the rollout — stale outputs are masked per-lane by the caller.
    @pl.when(act_ref[pl.program_id(0)] > 0)
    def _():
        dt = scal_ref[0]
        g = g_ref[0]  # (1, bt): broadcasts against (3, bt) lane vectors
        m_inv = minv_ref[0]
        alpha = alpha_ref[:]
        q_l = qmat_ref[:]
        r_l = rmat_ref[:]
        extra = extra_ref[:]
        i_l = i_ref[:]
        iinv_l = iinv_ref[:]
        # (Bt,) lane layout / (8, 128) supertile: layout-agnostic body
        bshape = alpha.shape[1:]
        dtype = alpha.dtype

        ez = jnp.concatenate(
            [jnp.zeros((2,) + bshape, dtype), jnp.ones((1,) + bshape, dtype)],
            axis=0,
        )

        def stage(n, carry):
            quat, trans, vel, cost = carry
            # feedback control update (ilqr.hh:158-161)
            dx = _state_minus(quat, trans, vel, q_ref[n], t_ref[n], v_ref[n])
            u = u_ref[n] + alpha * ks_ref[n] + L.matvec(bigks_ref[n], dx)
            if use_box:
                u = jnp.clip(u, lo_ref[:], hi_ref[:])

            # stage cost of the produced (state, control) pair
            dxd = _state_minus(quat, trans, vel, dq_ref[n], dt_ref[n], dv_ref[n])
            du = u - du_ref[n]
            if use_weights:
                cost = cost + w_ref[n] * (
                    L.dot_lanes(dxd, L.matvec(q_l, dxd))
                    + L.dot_lanes(du, L.matvec(r_l, du))
                )
            else:
                # keep the exact pre-weights summation order: f32 cost
                # accumulation is association-sensitive and re-ordering it
                # shifts line-search accept boundaries (caught by
                # tests/test_accuracy_f32.py)
                cost = (
                    cost
                    + L.dot_lanes(dxd, L.matvec(q_l, dxd))
                    + L.dot_lanes(du, L.matvec(r_l, du))
                )

            oq_ref[n] = quat
            ot_ref[n] = trans
            ov_ref[n] = vel
            ou_ref[n] = u

            quat_next, trans_next, vel_next = dynamics_step(
                dt, g, m_inv, extra, i_l, iinv_l, ez, quat, trans, vel, u
            )
            return (quat_next, trans_next, vel_next, cost)

        init = (
            q_ref[0],
            t_ref[0],
            v_ref[0],
            jnp.zeros((1,) + bshape, dtype),
        )
        _, _, _, cost = jax.lax.fori_loop(0, n_stages, stage, init)
        cost_ref[:] = cost


@functools.partial(
    jax.jit,
    static_argnames=(
        "n", "batch", "lane_model", "use_box", "use_weights",
        "cost_batched", "params_batched", "interpret", "supertile",
    ),
)
def _rollout_call(
    scal,
    tile_act,
    states_q,
    states_t,
    states_v,
    controls,
    ks,
    big_ks,
    alpha,
    des_q,
    des_t,
    des_v,
    des_u,
    q_mat,
    r_mat,
    w,
    g,
    m_inv,
    extra,
    inertia,
    inertia_inv,
    lo,
    hi,
    n,
    batch,
    lane_model,
    use_box,
    use_weights,
    cost_batched,
    params_batched,
    interpret,
    supertile=False,
):
    dtype = states_q.dtype
    u = controls.shape[1]  # control dimension (lane layout (N, u, B))
    extra_core = extra.shape[:-1]  # per-model operand core dims
    w_core = w.shape[:-1]
    bound_core = lo.shape[:-1]  # (u,) real bounds / (1,) dummy
    box_batched = lo.shape[-1] != TILE
    if supertile:
        from .backward import SUPER_SUB, SUPER_TILE, _to_super

        n_tiles = batch // SUPER_TILE
        btile = (SUPER_SUB, TILE)

        def prep(a):
            if a.shape[-1] == TILE and batch != TILE:
                return jnp.broadcast_to(
                    a[..., None, :], a.shape[:-1] + btile
                )
            return _to_super(a)

        (
            states_q, states_t, states_v, controls, ks, big_ks, alpha,
            des_q, des_t, des_v, des_u, q_mat, r_mat, w, g, m_inv, extra,
            inertia, inertia_inv, lo, hi,
        ) = map(
            prep,
            (
                states_q, states_t, states_v, controls, ks, big_ks,
                alpha, des_q, des_t, des_v, des_u, q_mat, r_mat, w, g,
                m_inv, extra, inertia, inertia_inv, lo, hi,
            ),
        )
        lane_block = lambda shape: pl.BlockSpec(
            shape + btile,
            lambda i: (0,) * len(shape) + (0, i),
            memory_space=pltpu.VMEM,
        )
        fixed_block = lambda shape: pl.BlockSpec(
            shape + btile,
            lambda i: (0,) * (len(shape) + 2),
            memory_space=pltpu.VMEM,
        )
        obatch = (SUPER_SUB, n_tiles * TILE)
    else:
        n_tiles = batch // TILE
        btile = (TILE,)
        lane_block = lambda shape: pl.BlockSpec(
            shape + (TILE,), lambda i: (0,) * len(shape) + (i,), memory_space=pltpu.VMEM
        )
        fixed_block = lambda shape: pl.BlockSpec(
            shape + (TILE,), lambda i: (0,) * (len(shape) + 1), memory_space=pltpu.VMEM
        )
        obatch = (batch,)
    # bounds may be shared (one (., TILE) broadcast tile; at a single tile
    # the two index maps coincide, so shape inference is unambiguous) or
    # per-scenario ((., B) lane tiles — backward._prep_limits)
    box_block = (lane_block if box_batched else fixed_block)(bound_core)
    des_block = lane_block if cost_batched.des else fixed_block
    qr_block = lane_block if cost_batched.qr else fixed_block
    param_block = lane_block if params_batched else fixed_block
    w_block = (
        lane_block if (use_weights and cost_batched.w) else fixed_block
    )(w_core)
    kernel = functools.partial(
        _rollout_kernel, n, lane_model.dynamics_step, use_box, use_weights
    )
    oq, ot, ov, ou, cost = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            lane_block((n, 4)),
            lane_block((n, 3)),
            lane_block((n, 6)),
            lane_block((n, u)),
            lane_block((n, u)),
            lane_block((n, u, 12)),
            lane_block((1,)),
            des_block((n, 4)),
            des_block((n, 3)),
            des_block((n, 6)),
            des_block((n, u)),
            qr_block((12, 12)),
            qr_block((u, u)),
            w_block,
            param_block((1, 1)),
            param_block((1, 1)),
            param_block(extra_core),
            param_block((3, 3)),
            param_block((3, 3)),
            box_block,
            box_block,
        ],
        out_specs=[
            lane_block((n, 4)),
            lane_block((n, 3)),
            lane_block((n, 6)),
            lane_block((n, u)),
            lane_block((1,)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, 4) + obatch, dtype),
            jax.ShapeDtypeStruct((n, 3) + obatch, dtype),
            jax.ShapeDtypeStruct((n, 6) + obatch, dtype),
            jax.ShapeDtypeStruct((n, u) + obatch, dtype),
            jax.ShapeDtypeStruct((1,) + obatch, dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=(120 if supertile else 100) * 1024 * 1024
        ),
        interpret=interpret,
    )(
        scal,
        tile_act,
        states_q,
        states_t,
        states_v,
        controls,
        ks,
        big_ks,
        alpha,
        des_q,
        des_t,
        des_v,
        des_u,
        q_mat,
        r_mat,
        w,
        g,
        m_inv,
        extra,
        inertia,
        inertia_inv,
        lo,
        hi,
    )
    if supertile:
        from .backward import _from_super

        return tuple(
            _from_super(a, batch) for a in (oq, ot, ov, ou, cost)
        )
    return oq, ot, ov, ou, cost


def rollout_cost_fused(
    params, cost, traj, ks, big_ks, alpha, dt_s, interpret=False,
    tile_act=None, model=None, limits=None, supertile=False,
):
    """Batched replacement for vmap(forward_sim) + vmap(trajectory_cost).

    traj leaves (B, N, ...), ks (B, N, u), big_ks (B, N, u, 12), alpha (B,).
    Physical params may be shared or per-scenario (see backward._prep_params).
    `tile_act` (B//128,) i32: tiles with no pending lane skip the rollout
    (stale outputs must be masked per-lane by the caller). `model` selects
    the model family (kernels/models.py lane_model_for). `limits=(lo, hi)`
    clamps every produced control into the box (control-limited rollouts,
    solver/constrained.py semantics).
    Returns (Trajectory with (B, N, ...) leaves, cost (B,)).
    """
    from ..models.quadrotor import State
    from ..lie.se3 import SE3
    from ..solver.ilqr import Trajectory
    from .backward import _prep_limits
    from .models import lane_model_for

    lm = lane_model_for(params, model)
    controls = traj.controls
    batch, n = controls.shape[0], controls.shape[1]
    if batch % TILE != 0:
        raise ValueError(f"batch {batch} must be a multiple of {TILE}")
    dtype = controls.dtype

    des_q, des_t, des_v, des_u, q_mat, r_mat, w, cost_batched = _prep_cost(
        cost, batch, dtype, r_scale=1.0
    )
    use_weights = cost.stage_weights is not None
    g, m_inv, _, extra, inertia, inertia_inv, params_batched = lm.prep_params(
        params, dt_s, dtype
    )
    lo, hi, use_box, _ = _prep_limits(limits, lm.u_dim, dtype)
    scal = jnp.asarray([dt_s, 0.0, 0.0, 0.0], dtype)
    if supertile:
        from .backward import SUPER_TILE

        if batch % SUPER_TILE != 0:
            raise ValueError(
                f"supertile=True needs batch a multiple of {SUPER_TILE}, "
                f"got {batch}"
            )
    if tile_act is None:
        from .backward import SUPER_TILE

        tile_act = jnp.ones(
            (batch // (SUPER_TILE if supertile else TILE),), jnp.int32
        )

    oq, ot, ov, ou, cost_out = _rollout_call(
        scal,
        tile_act,
        _to_lanes(traj.states.pose.quat),
        _to_lanes(traj.states.pose.trans),
        _to_lanes(traj.states.vel),
        _to_lanes(controls),
        _to_lanes(ks),
        _to_lanes(big_ks),
        alpha[None, :],
        des_q,
        des_t,
        des_v,
        des_u,
        q_mat,
        r_mat,
        w,
        g,
        m_inv,
        extra,
        inertia,
        inertia_inv,
        lo,
        hi,
        n,
        batch,
        lm,
        use_box,
        use_weights,
        cost_batched,
        params_batched,
        interpret,
        supertile,
    )
    new_traj = Trajectory(
        times=traj.times,
        states=State(
            pose=SE3(quat=jnp.moveaxis(oq, -1, 0), trans=jnp.moveaxis(ot, -1, 0)),
            vel=jnp.moveaxis(ov, -1, 0),
        ),
        controls=jnp.moveaxis(ou, -1, 0),
    )
    return new_traj, cost_out[0]
