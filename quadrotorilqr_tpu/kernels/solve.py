"""Whole-solve fused Pallas kernel: the COMPLETE iLQR loop in one program.

The batch-level solver (solver/batched.py) launches 2+ kernels per outer
trip (backward pass, line-search rollouts) with XLA glue between them. For
large batches the glue amortizes; at small batch (the latency regime —
BASELINE.json config 1 is ONE scenario) fixed per-kernel overhead dominates:
measured ~1.5-2 ms per kernel launch at one 128-lane tile vs ~10 us of
actual VPU work. This kernel removes ALL of it: one `pallas_call` runs the
entire reference solve loop (ilqr.hh:53-87) — backward Riccati recursion,
per-lane backtracking line search, pre/post convergence checks, status and
iteration accounting — for a 128-scenario tile without leaving VMEM.

Control-flow mapping (Mosaic cannot lower `lax.while_loop` with vector
carries — scf.yield legalization fails — so loops are bounded `fori_loop`s
with predicated bodies):

  * outer trips: `fori_loop(0, max_iters)`, body wrapped in
    `@pl.when(not all_done)` with the all-done flag in SMEM — finished
    solves degrade to empty trips costing only loop overhead;
  * line search: `fori_loop(0, ls_max_iters)` with `@pl.when(any pending)`;
  * per-lane state that crosses trip boundaries (cost, done, status,
    iterations, alpha, accepted, best-candidate cost) lives as rows of one
    (8, 128) VMEM scratch tile.

The stage math is IMPORTED from kernels/backward.py (`_riccati_stage`) and
kernels/rollout.py (`_state_minus`, `_dynamics_step`) — one definition,
shared lane-for-lane with the per-pass kernels, so the f64 interpret parity
contract (tests/test_solve_fused.py) extends to this kernel automatically.

Semantics are lane-for-lane identical to solver/batched.solve_batch_fused
(itself the reference loop, ilqr.hh:53-205): trip 0 takes an unconditional
full step (ilqr.hh:71-73), later trips pre-check expected cost (:66-68),
backtrack with per-lane alpha (:174-194), post-check achieved cost (:82-84).

VMEM bound: ~61 KB per horizon stage per tile (in/out/best trajectories,
gains, desired) — horizons up to ~200 fit the ~16 MB budget.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import lanes as L
from .backward import (
    SUPER_SUB,
    SUPER_TILE,
    TILE,
    _from_super,
    _prep_cost,
    _riccati_stage,
    _to_lanes,
    _to_super,
)
from .rollout import _state_minus

# rows of the per-lane solver-state scratch tile
_COST, _DONE, _STATUS, _ITERS, _ALPHA, _ACCEPTED, _BESTC, _PROBES = range(8)
_STATE_ROWS = 8  # one f32 sublane tile

# ~61 KB VMEM per horizon stage per tile at u=4 (module docstring): beyond
# this Mosaic fails allocation. solver/batched.solve_batch_latency routes
# longer horizons to the streamed kernel automatically.
MAX_HORIZON = 256

def max_horizon_for(u_dim):
    """Model-aware VMEM horizon bound. Per-stage VMEM is ~(48 + 16*u) rows
    of (1, TILE) f32 across the in/out/desired/candidate/gain buffers
    (u appears in controls x4, k, and the 12-row K block), so the budget
    that holds 256 stages at u=4 (112 rows/stage) shrinks accordingly."""
    return (MAX_HORIZON * 112) // (48 + 16 * u_dim)


# ---------------------------------------------------------------------------
# Trip / line-search state machine, shared with the STREAMED whole-solve
# kernel (kernels/stream.py). Like the per-stage math (_riccati_stage,
# _dynamics_step), the bookkeeping has ONE definition: the two kernels must
# stay lane-for-lane identical, so any semantic change lands in both by
# construction. `get`/`put` are the per-lane solver-state row accessors.
# ---------------------------------------------------------------------------


def _trip_gate(get, conv, i, continuation, qutk, ktquuk):
    """Pre-trip convergence gate (ilqr.hh:58-68).

    Returns (current, done, li, li_pos, pre_conv, active). `li` is the
    logical trip index: a continuation starts past the trip-0 specials
    (ilqr.hh:71-73 applies only to a fresh solve).
    """
    current = get(_COST)
    done = get(_DONE) > 0.5
    li = i + (1 if continuation else 0)
    li_pos = li > 0
    expected = current + (qutk + 0.5 * ktquuk)
    pre_conv = jnp.logical_and(
        jnp.logical_and(li_pos, conv(current, expected)),
        jnp.logical_not(done),
    )
    active = jnp.logical_and(
        jnp.logical_not(done), jnp.logical_not(pre_conv)
    )
    return current, done, li, li_pos, pre_conv, active


def _ls_probe_commit(
    get, put, ls_frac, ls_step, li, active, current, qutk, ktquuk,
    cand_cost, pending, accepted, alpha,
):
    """Accept/backtrack bookkeeping for one line-search probe
    (ilqr.hh:174-194; trip 0 of a fresh solve force-accepts, :71-73).
    Returns the still-pending mask for the caller's SMEM probe counter."""
    desired = ls_frac * (alpha * qutk + alpha * alpha * ktquuk * 0.5)
    ok = (cand_cost - current) < desired
    ok = jnp.logical_or(ok, li == 0)
    put(_BESTC, jnp.where(pending, cand_cost, get(_BESTC)))
    accepted2 = jnp.logical_or(accepted, jnp.logical_and(pending, ok))
    put(_ACCEPTED, accepted2.astype(cand_cost.dtype))
    put(
        _ALPHA,
        jnp.where(
            jnp.logical_or(accepted2, jnp.logical_not(active)),
            alpha,
            alpha * ls_step,
        ),
    )
    return jnp.logical_and(active, jnp.logical_not(accepted2))


def _trip_close(get, put, conv, dtype, li_pos, pre_conv, active, done, current):
    """Post-line-search accept / converge / fail bookkeeping
    (ilqr.hh:58-84). Returns the count of still-open lanes for the caller's
    all-done SMEM flag."""
    accepted = get(_ACCEPTED) > 0.5
    best_cost = get(_BESTC)
    post_conv = jnp.logical_and(
        jnp.logical_and(li_pos, conv(current, best_cost)),
        jnp.logical_and(active, accepted),
    )
    ls_failed = jnp.logical_and(active, jnp.logical_not(accepted))
    put(_COST, jnp.where(active, best_cost, current))
    status = get(_STATUS)
    converged = jnp.logical_or(post_conv, pre_conv)
    status = jnp.where(
        ls_failed,
        jnp.asarray(2.0, dtype),  # STATUS_LINE_SEARCH_FAILED
        jnp.where(converged, jnp.asarray(1.0, dtype), status),
    )
    put(_STATUS, status)
    done2 = jnp.logical_or(done, jnp.logical_or(converged, ls_failed))
    put(_DONE, done2.astype(dtype))
    put(_ITERS, get(_ITERS) + active.astype(dtype))
    return jnp.sum(jnp.logical_not(done2).astype(dtype))


def _solve_kernel(
    n_stages,
    max_iters,
    ls_max_iters,
    continuation,
    lane_model,  # model family descriptor (kernels/models.py)
    use_weights,  # static: per-stage cost weights active (w_ref read)
    use_box,  # static: control limits active (lo/hi refs read)
    record_history,  # static: write the per-trip cost history (ohist rows)
    fscal_ref,  # SMEM (8,): [dt, quu_reg, rtol, atol, ls_step, ls_frac, 0, 0]
    q_ref,  # (N, 4, Bt) initial state quats
    t_ref,  # (N, 3, Bt)
    v_ref,  # (N, 6, Bt)
    u_ref,  # (N, u, Bt)
    dq_ref,  # desired (broadcast tile or per-lane)
    dtr_ref,
    dv_ref,
    du_ref,
    qmat_ref,  # (12, 12, Bt) cost Q
    rmat_ref,  # (u, u, Bt) cost R
    w_ref,  # (N, 1, Bt) stage weights ((1, 1, Bt) dummy when !use_weights)
    g_ref,  # (1, 1, Bt) params (broadcast or per-lane)
    minv_ref,  # (1, 1, Bt)
    ju_ref,  # (12, u, Bt)
    extra_ref,  # per-model operand (quadrotor: (3, u, Bt) I^-1 @ moment_arms)
    i_ref,  # (3, 3, Bt)
    iinv_ref,  # (3, 3, Bt)
    lo_ref,  # (u, Bt) control lower bounds ((1, Bt) dummy when !use_box)
    hi_ref,  # (u, Bt) upper bounds
    oq_ref,  # out (N, 4, Bt): final trajectory (doubles as the live one)
    ot_ref,
    ov_ref,
    ou_ref,
    ocost_ref,  # out (1, Bt)
    oiter_ref,  # out (1, Bt) f32 (cast to int32 by the wrapper)
    ostat_ref,  # out (1, Bt) f32 STATUS_* codes
    oprob_ref,  # out (1, Bt): executed probe sweeps (tile-uniform; the
    #             roofline work model's rollouts-per-trip measurement)
    ohist_ref,  # out (max_iters, Bt) per-trip cost history ((1, Bt) dummy
    #            when !record_history): slot i = the committed cost of the
    #            lanes that EXECUTED trip i, 0 otherwise — the XLA debug
    #            record's costs buffer (solver/batched.py populate_debug)
    ks_ref,  # scratch (N, u, Bt)
    bigks_ref,  # scratch (N, u, 12, Bt)
    bq_ref,  # scratch (N, 4, Bt): best line-search candidate
    bt_ref,  # scratch (N, 3, Bt)
    bv_ref,  # scratch (N, 6, Bt)
    bu_ref,  # scratch (N, u, Bt)
    st_ref,  # scratch (8, Bt): per-lane solver state rows
    flag_ref,  # scratch SMEM (2,): [all_done, ls_pending_count]
):
    dt = fscal_ref[0]
    quu_reg = fscal_ref[1]
    rtol = fscal_ref[2]
    atol = fscal_ref[3]
    ls_step = fscal_ref[4]
    ls_frac = fscal_ref[5]
    q_l = qmat_ref[:]
    r_l = rmat_ref[:]
    r2_l = 2.0 * r_l
    g2 = g_ref[:]  # (1, 1, bt) for the backward pass blocks
    g1 = g_ref[0]  # (1, bt) for the rollout dynamics
    m_inv = minv_ref[0]
    ju = ju_ref[:]
    ju_t = L.transpose(ju)
    extra = extra_ref[:]
    drag = lane_model.drag_rows(extra)
    i_l = i_ref[:]
    iinv_l = iinv_ref[:]
    box = (lo_ref[:], hi_ref[:]) if use_box else None
    bshape = q_l.shape[2:]  # (Bt,) lane layout / (8, 128) supertile
    dtype = q_l.dtype
    zeros1 = jnp.zeros((1,) + bshape, dtype)
    ez = jnp.concatenate(
        [jnp.zeros((2,) + bshape, dtype), jnp.ones((1,) + bshape, dtype)],
        axis=0,
    )
    # substepped integration (kernels/models.substepped_lane_model): the
    # Riccati stage chains per-substep jacobian blocks; the chain rolls the
    # intermediate substates with the BASE single-step dynamics
    chain = (
        (lane_model.base.dynamics_step, g1, m_inv, extra, ez)
        if lane_model.substeps > 1
        else None
    )

    def get(r):
        return st_ref[r : r + 1]

    def put(r, val):
        st_ref[r : r + 1] = val

    def conv(cur, new):
        # division-free reference criterion (ilqr.hh:196-205; solver.is_converged)
        diff = jnp.abs(cur - new)
        return jnp.logical_or(diff < rtol * jnp.abs(cur), diff < atol)

    def stage_cost(quat, trans, vel, u, n):
        dxd = _state_minus(quat, trans, vel, dq_ref[n], dtr_ref[n], dv_ref[n])
        duv = u - du_ref[n]
        c = L.dot_lanes(dxd, L.matvec(q_l, dxd)) + L.dot_lanes(
            duv, L.matvec(r_l, duv)
        )
        return w_ref[n] * c if use_weights else c

    # --- init: live trajectory lives in the output refs ---
    oq_ref[:] = q_ref[:]
    ot_ref[:] = t_ref[:]
    ov_ref[:] = v_ref[:]
    ou_ref[:] = u_ref[:]
    st_ref[:] = jnp.zeros((_STATE_ROWS,) + bshape, dtype)
    if record_history:
        ohist_ref[:] = jnp.zeros((max_iters,) + bshape, dtype)

    if continuation or max_iters == 0:
        # the input trajectory is feasible: its true cost seeds the loop
        # (trip 0 of a fresh solve never compares against it — skip there)
        def cseed(n, c):
            return c + stage_cost(oq_ref[n], ot_ref[n], ov_ref[n], ou_ref[n], n)

        put(_COST, jax.lax.fori_loop(0, n_stages, cseed, zeros1))

    flag_ref[0] = jnp.zeros((), dtype)  # all_done

    def trip(i, tok):
        @pl.when(flag_ref[0] < 0.5)
        def _():
            # ---- backward pass (ilqr.hh:97-147) ----
            def bstage(idx, carry):
                n = n_stages - 1 - idx
                v_x, v_xx, qutk, ktquuk = carry
                k, big_k, v_x2, v_xx2, qutk_inc, ktquuk_inc = _riccati_stage(
                    dt, quu_reg, q_l, r2_l, g2, ju, ju_t, i_l, iinv_l,
                    oq_ref[n], ot_ref[n], ov_ref[n], ou_ref[n],
                    dq_ref[n], dtr_ref[n], dv_ref[n], du_ref[n],
                    v_x, v_xx,
                    ju_lo_row=lane_model.ju_lo,
                    drag=drag,
                    substeps=lane_model.substeps,
                    chain=chain,
                    box=box,
                    w=w_ref[n] if use_weights else None,
                )
                ks_ref[n] = k
                bigks_ref[n] = big_k
                return (v_x2, v_xx2, qutk + qutk_inc, ktquuk + ktquuk_inc)

            binit = (
                jnp.zeros((12,) + bshape, dtype),
                jnp.zeros((12, 12) + bshape, dtype),
                zeros1,
                zeros1,
            )
            _, _, qutk, ktquuk = jax.lax.fori_loop(0, n_stages, bstage, binit)

            current, done, li, li_pos, pre_conv, active = _trip_gate(
                get, conv, i, continuation, qutk, ktquuk
            )

            # ---- line search (ilqr.hh:174-194; trip 0 = forced full step) ----
            put(_ALPHA, jnp.ones((1,) + bshape, dtype))
            put(_ACCEPTED, jnp.zeros((1,) + bshape, dtype))
            put(_BESTC, current)
            flag_ref[1] = jnp.sum(active.astype(dtype))

            def ls_trip(j, tok2):
                @pl.when(flag_ref[1] > 0.5)
                def _():
                    accepted = get(_ACCEPTED) > 0.5
                    pending = jnp.logical_and(active, jnp.logical_not(accepted))
                    alpha = get(_ALPHA)

                    def rstage(n, carry):
                        quat, trans, vel, c = carry
                        dx = _state_minus(
                            quat, trans, vel, oq_ref[n], ot_ref[n], ov_ref[n]
                        )
                        u = (
                            ou_ref[n]
                            + alpha * ks_ref[n]
                            + L.matvec(bigks_ref[n], dx)
                        )
                        if use_box:
                            u = jnp.clip(u, lo_ref[:], hi_ref[:])
                        c = c + stage_cost(quat, trans, vel, u, n)
                        bq_ref[n] = jnp.where(pending, quat, bq_ref[n])
                        bt_ref[n] = jnp.where(pending, trans, bt_ref[n])
                        bv_ref[n] = jnp.where(pending, vel, bv_ref[n])
                        bu_ref[n] = jnp.where(pending, u, bu_ref[n])
                        qn, tn, vn = lane_model.dynamics_step(
                            dt, g1, m_inv, extra, i_l, iinv_l, ez,
                            quat, trans, vel, u,
                        )
                        return (qn, tn, vn, c)

                    rinit = (oq_ref[0], ot_ref[0], ov_ref[0], zeros1)
                    _, _, _, cand_cost = jax.lax.fori_loop(
                        0, n_stages, rstage, rinit
                    )

                    put(_PROBES, get(_PROBES) + 1.0)
                    still_pending = _ls_probe_commit(
                        get, put, ls_frac, ls_step, li, active, current,
                        qutk, ktquuk, cand_cost, pending, accepted, alpha,
                    )
                    flag_ref[1] = jnp.sum(still_pending.astype(dtype))

                return tok2

            jax.lax.fori_loop(0, ls_max_iters, ls_trip, 0)

            # ---- merge accepted candidates into the live trajectory ----
            def mstage(n, tok3):
                oq_ref[n] = jnp.where(active, bq_ref[n], oq_ref[n])
                ot_ref[n] = jnp.where(active, bt_ref[n], ot_ref[n])
                ov_ref[n] = jnp.where(active, bv_ref[n], ov_ref[n])
                ou_ref[n] = jnp.where(active, bu_ref[n], ou_ref[n])
                return tok3

            jax.lax.fori_loop(0, n_stages, mstage, 0)

            n_open = _trip_close(
                get, put, conv, dtype, li_pos, pre_conv, active, done, current
            )
            if record_history:
                # one slot per EXECUTED update (ilqr.hh:78-80): the
                # committed cost for active lanes, zeros otherwise — the
                # exact buffer convention of the XLA debug path
                ohist_ref[i] = jnp.where(
                    active[0], get(_COST)[0], jnp.zeros(bshape, dtype)
                )
            flag_ref[0] = jnp.where(
                n_open < 0.5, jnp.ones((), dtype), jnp.zeros((), dtype)
            )

        return tok

    jax.lax.fori_loop(0, max_iters, trip, 0)

    ocost_ref[:] = get(_COST)
    oiter_ref[:] = get(_ITERS)
    ostat_ref[:] = get(_STATUS)
    oprob_ref[:] = get(_PROBES)


@functools.partial(
    jax.jit,
    static_argnames=(
        "n",
        "batch",
        "max_iters",
        "ls_max_iters",
        "continuation",
        "lane_model",
        "use_weights",
        "use_box",
        "record_history",
        "cost_batched",
        "params_batched",
        "interpret",
        "supertile",
    ),
)
def _solve_call(
    fscal,
    states_q,
    states_t,
    states_v,
    controls,
    des_q,
    des_t,
    des_v,
    des_u,
    q_mat,
    r_mat,
    w,
    g,
    m_inv,
    ju,
    extra,
    inertia,
    inertia_inv,
    lo,
    hi,
    n,
    batch,
    max_iters,
    ls_max_iters,
    continuation,
    lane_model,
    use_weights,
    use_box,
    record_history,
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
        # (..., B) per-lane operands -> (..., 8, S*128); (..., TILE)
        # broadcast tiles materialize across the 8 sublanes
        n_tiles = batch // SUPER_TILE
        btile = (SUPER_SUB, TILE)

        def prep(a):
            if a.shape[-1] == TILE and batch != TILE:
                return jnp.broadcast_to(
                    a[..., None, :], a.shape[:-1] + btile
                )
            return _to_super(a)

        (
            states_q, states_t, states_v, controls, des_q, des_t, des_v,
            des_u, q_mat, r_mat, w, g, m_inv, ju, extra, inertia,
            inertia_inv, lo, hi,
        ) = map(
            prep,
            (
                states_q, states_t, states_v, controls, des_q, des_t,
                des_v, des_u, q_mat, r_mat, w, g, m_inv, ju, extra,
                inertia, inertia_inv, lo, hi,
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
    des_block = lane_block if cost_batched.des else fixed_block
    qr_block = lane_block if cost_batched.qr else fixed_block
    param_block = lane_block if params_batched else fixed_block
    w_block = (
        lane_block if (use_weights and cost_batched.w) else fixed_block
    )(w_core)
    # bounds may be shared (one (., TILE) broadcast tile; at a single tile
    # the two index maps coincide, so shape inference is unambiguous) or
    # per-scenario ((., B) lane tiles — backward._prep_limits)
    box_block = (lane_block if box_batched else fixed_block)(bound_core)
    hist_rows = max_iters if record_history else 1
    kernel = functools.partial(
        _solve_kernel, n, max_iters, ls_max_iters, continuation, lane_model,
        use_weights, use_box, record_history,
    )
    oq, ot, ov, ou, ocost, oiter, ostat, oprob, ohist = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            lane_block((n, 4)),
            lane_block((n, 3)),
            lane_block((n, 6)),
            lane_block((n, u)),
            des_block((n, 4)),
            des_block((n, 3)),
            des_block((n, 6)),
            des_block((n, u)),
            qr_block((12, 12)),
            qr_block((u, u)),
            w_block,
            param_block((1, 1)),
            param_block((1, 1)),
            param_block((12, u)),
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
            lane_block((1,)),
            lane_block((1,)),
            lane_block((1,)),
            lane_block((hist_rows,)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, 4) + obatch, dtype),
            jax.ShapeDtypeStruct((n, 3) + obatch, dtype),
            jax.ShapeDtypeStruct((n, 6) + obatch, dtype),
            jax.ShapeDtypeStruct((n, u) + obatch, dtype),
            jax.ShapeDtypeStruct((1,) + obatch, dtype),
            jax.ShapeDtypeStruct((1,) + obatch, dtype),
            jax.ShapeDtypeStruct((1,) + obatch, dtype),
            jax.ShapeDtypeStruct((1,) + obatch, dtype),
            jax.ShapeDtypeStruct((hist_rows,) + obatch, dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((n, u) + btile, dtype),
            pltpu.VMEM((n, u, 12) + btile, dtype),
            pltpu.VMEM((n, 4) + btile, dtype),
            pltpu.VMEM((n, 3) + btile, dtype),
            pltpu.VMEM((n, 6) + btile, dtype),
            pltpu.VMEM((n, u) + btile, dtype),
            pltpu.VMEM((_STATE_ROWS,) + btile, dtype),
            pltpu.SMEM((2,), dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            # supertile grid steps hold 8x the per-stage rows; v5e has
            # 128 MiB physical VMEM and the N=200 + per-scenario Q/R
            # workload (config 3) measures 113.8 MiB scoped — the 100 MiB
            # default headroom is only needed for the multi-program lane
            # pipelines
            vmem_limit_bytes=(120 if supertile else 100) * 1024 * 1024
        ),
        interpret=interpret,
    )(
        fscal,
        states_q,
        states_t,
        states_v,
        controls,
        des_q,
        des_t,
        des_v,
        des_u,
        q_mat,
        r_mat,
        w,
        g,
        m_inv,
        ju,
        extra,
        inertia,
        inertia_inv,
        lo,
        hi,
    )
    if supertile:
        outs = (oq, ot, ov, ou, ocost, oiter, ostat, oprob, ohist)
        return tuple(_from_super(a, batch) for a in outs)
    return oq, ot, ov, ou, ocost, oiter, ostat, oprob, ohist


def solve_fused_whole(
    params,
    cost,
    traj,
    dt_s,
    options,
    interpret=False,
    continuation=False,
    model=None,
    limits=None,
    return_history=False,
    return_probes=False,
    supertile=False,
):
    """Whole-solve single-kernel iLQR for (B, N, ...) trajectories, B a
    multiple of 128. Latency-optimized: use solver/batched.py for huge
    batches (it pipelines tiles), this for small-batch / single-scenario
    solves. `model` selects the model family (kernels/models.py
    lane_model_for; default inferred from the params type). Returns the
    same tuple layout as the batch loop:
    (Trajectory, cost (B,), iterations (B,) i32, status (B,) i32).
    `limits=(lo, hi)` (scalars / (u,) arrays shared across the batch, or
    (B, u) per scenario) switches the stage gain solve to the
    projected-Newton box-QP and clamps every rollout control
    (solver/constrained.py semantics). `return_history=True` appends the
    per-trip cost history ((B, max_iters); slot i = the committed cost of
    lanes that executed trip i, zeros otherwise — the XLA debug record's
    costs buffer) to the tuple: populate_debug at kernel speed
    (solver/batched.solve_batch_latency builds the CostHistory record
    from it)."""
    from ..lie.se3 import SE3
    from ..models.quadrotor import State
    from ..solver.ilqr import Trajectory
    from .models import lane_model_for

    lm = lane_model_for(params, model)
    controls = traj.controls
    batch, n = controls.shape[0], controls.shape[1]
    if batch % TILE != 0:
        raise ValueError(f"batch {batch} must be a multiple of {TILE}")
    if supertile and batch % SUPER_TILE != 0:
        raise ValueError(
            f"supertile=True needs batch a multiple of {SUPER_TILE} "
            f"(8 sublane scenarios x 128 lanes per grid step), got {batch}"
        )
    if n > max_horizon_for(lm.u_dim):
        raise ValueError(
            f"horizon {n} exceeds the whole-solve kernel's VMEM budget "
            f"({max_horizon_for(lm.u_dim)} stages at u={lm.u_dim}); use "
            "kernels.stream.solve_fused_streamed (any horizon) or "
            "solver.batched.solve_batch_latency, which routes there "
            "automatically"
        )
    dtype = controls.dtype
    ls = options.line_search_params
    if int(ls.max_iters) < 1:
        # the trip-0 forced full step (ilqr.hh:71-73) is implemented as a
        # forced-accept probe inside the line-search loop: zero probes would
        # silently skip it (and never record _BESTC/_COST)
        raise ValueError(
            "line_search_params.max_iters must be >= 1 on the whole-solve "
            "kernel; use solver.batched.solve_batch_fused (or "
            "solve_batch_latency, which routes there) for zero-probe runs"
        )
    cc = options.convergence_criteria

    des_q, des_t, des_v, des_u, q_mat, r_mat, w, cost_batched = _prep_cost(
        cost, batch, dtype, r_scale=1.0
    )
    use_weights = cost.stage_weights is not None
    g, m_inv, ju, extra, inertia, inertia_inv, params_batched = lm.prep_params(
        params, dt_s, dtype
    )
    from .backward import _prep_limits

    lo, hi, use_box, _ = _prep_limits(limits, lm.u_dim, dtype)
    fscal = jnp.asarray(
        [
            dt_s,
            options.quu_reg,
            cc.rtol,
            cc.atol,
            ls.step_update,
            ls.desired_reduction_frac,
            0.0,
            0.0,
        ],
        dtype,
    )

    oq, ot, ov, ou, ocost, oiter, ostat, oprob, ohist = _solve_call(
        fscal,
        _to_lanes(traj.states.pose.quat),
        _to_lanes(traj.states.pose.trans),
        _to_lanes(traj.states.vel),
        _to_lanes(controls),
        des_q,
        des_t,
        des_v,
        des_u,
        q_mat,
        r_mat,
        w,
        g,
        m_inv,
        ju,
        extra,
        inertia,
        inertia_inv,
        lo,
        hi,
        n,
        batch,
        int(cc.max_iters),
        int(ls.max_iters),
        continuation,
        lm,
        use_weights,
        use_box,
        return_history,
        cost_batched,
        params_batched,
        interpret,
        supertile,
    )
    new_traj = Trajectory(
        times=traj.times,
        states=State(
            pose=SE3(
                quat=jnp.moveaxis(oq, -1, 0), trans=jnp.moveaxis(ot, -1, 0)
            ),
            vel=jnp.moveaxis(ov, -1, 0),
        ),
        controls=jnp.moveaxis(ou, -1, 0),
    )
    out = (
        new_traj,
        ocost[0],
        oiter[0].astype(jnp.int32),
        ostat[0].astype(jnp.int32),
    )
    if return_history:
        out = out + (ohist.T,)
    if return_probes:
        out = out + (oprob[0],)
    return out
