"""Streamed whole-solve FDDP kernel: the ROBUST solver at any horizon.

kernels/fddp.py holds every stage (trajectory, desired, gains, defects,
candidates) in VMEM, capping it at ~231 stages (u=4). This kernel is its
HBM-streamed counterpart, exactly as kernels/stream.py is for the exact
loop (read its module docstring for the streaming rationale — the solve is
~30x compute-bound, synchronous chunk DMA costs <3%): per-stage data lives
in HBM and is DMA'd through a fixed VMEM window, so the robust
multiple-shooting solver runs at kernel speed for horizons limited only by
HBM.

Semantics are the flattened FDDP loop of kernels/fddp.py (itself
lane-for-lane equal to vmap(solver/fddp.solve_fddp)); parity with the VMEM
FDDP kernel where both fit is the contract (tests/test_fddp_fused.py).

Streaming additions on top of kernels/stream.py's design:

  * DEFECTS buffer: a per-tile HBM scratch (N, 16, TILE) that sequential
    grid steps reuse (like the gains buffer). Recomputed every trip by a
    forward sweep; d_k needs x_{k+1}, which crosses chunk boundaries, so
    each chunk computes its interior defects (static width w-1) plus ONE
    boundary defect from the dynamics-step carry of the previous chunk,
    stored through a dedicated (1, 16) row window.
  * the backward, quadratic-model, and rollout sweeps stream a defect
    window alongside trajectory/desired/gains;
  * the apply sweep merges ONLY accepted lanes (FDDP keeps a rejected
    lane's trajectory for the adaptive-mu retry — unlike the exact loop,
    whose line-search-failed lanes carry the last candidate), re-rolling
    each lane at its per-lane _ALPHA (frozen at acceptance).

The per-stage math is IMPORTED from kernels/backward.py and
kernels/rollout.py — one definition shared with every other engine.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import lanes as L
from .backward import (
    TILE,
    _jx_vec,
    _prep_cost,
    _riccati_stage,
    _stage_cost_diffs,
    _stage_jx_blocks,
    _to_lanes,
)
from .fddp import (
    _ACCEPTED,
    _ALPHA,
    _BESTC,
    _COST,
    _DONE,
    _GAP,
    _ITERS,
    _L1,
    _L2,
    _MU,
    _STATE_ROWS,
    _STATUS,
    _fddp_trip_close,
    _goldstein_probe_commit,
)
from ..solver.fddp import _probe_cap, _saturating_stage_cost_add
from .rollout import _state_minus
from .backward import (
    SUPER_SUB,
    SUPER_TILE,
    _from_super,
    _to_super,
)
from .stream import (
    DEFAULT_CHUNK,
    _pack_stages,
    _up_stream,
    des_rows,
    gain_rows,
    traj_rows,
)

DEFECT_ROWS = 16  # ceil8(12): packed defect rows (d 0:12 | pad)


def _stream_fddp_kernel(
    n_stages,
    max_iters,
    ls_max_iters,
    chunk,
    cost_batched,
    lane_model,  # model family descriptor (kernels/models.py)
    use_weights,  # static: per-stage cost weights ride the desired stream
    use_box,  # static: control limits active (lo/hi refs read)
    ddp,  # static: exact-DDP curvature in the Riccati stage + quad model
    supertile,  # static: packed arrays carry an extra (8,) sublane dim
    fscal_ref,  # SMEM (8,): [dt, quu_reg floor, rtol, atol, ls_step, 0, 0, 0]
    gscal_ref,  # SMEM (12,): [gf, gub, gap_tol, reg_init, up, down, min,
    #             max, alpha_dec, alpha_inc, 0, 0]
    tin_ref,  # HBM (N, TR, B) packed initial trajectory
    des_ref,  # HBM (N, DR, Bd) packed desired (Bd = B batched / TILE shared)
    qmat_ref,  # VMEM (12, 12, Bt) cost Q
    rmat_ref,  # VMEM (u, u, Bt) cost R
    g_ref,  # VMEM (1, 1, Bt) params (broadcast or per-lane)
    minv_ref,
    ju_ref,  # (12, u, Bt)
    extra_ref,  # per-model operand
    i_ref,  # (3, 3, Bt)
    iinv_ref,  # (3, 3, Bt)
    lo_ref,  # (u, Bt) control lower bounds ((1, Bt) dummy when !use_box)
    hi_ref,  # (u, Bt) upper bounds
    imu_ref,  # (1, Bt) initial per-lane Levenberg mu (zeros = fresh solve)
    istat_ref,  # (1, Bt) initial STATUS_* codes (nonzero lanes are FROZEN)
    iiter_ref,  # (1, Bt) initial iteration counts (resume continues them)
    live_ref,  # out HBM (N, TR, B): live/final packed trajectory
    gains_ref,  # out HBM (N, GR, TILE): per-tile gains scratch (reused)
    defs_ref,  # out HBM (N, 16, TILE): per-tile defects scratch (reused)
    ocost_ref,  # out VMEM (1, Bt)
    oiter_ref,  # out VMEM (1, Bt) f32 (cast by the wrapper)
    ostat_ref,  # out VMEM (1, Bt) f32 STATUS_* codes
    omu_ref,  # out VMEM (1, Bt): final per-lane mu (feeds a later resume)
    tbuf,  # scratch VMEM (W, TR, TILE): trajectory window
    dbuf,  # scratch VMEM (W, DR, TILE): desired window
    gbuf,  # scratch VMEM (W, GR, TILE): gains window
    fbuf,  # scratch VMEM (W, 16, TILE): defects window
    st_ref,  # scratch VMEM (_STATE_ROWS, TILE): per-lane solver state rows
    flag_ref,  # scratch SMEM (3,): [all_done, ls_pending_count,
    #            defects_stale (some lane accepted last trip / trip 0)]
    sems,  # DMA semaphores (6,)
):
    tile = pl.program_id(0)
    lane0 = tile * TILE
    dlane0 = lane0 if cost_batched else 0

    dt = fscal_ref[0]
    quu_reg_floor = fscal_ref[1]
    rtol = fscal_ref[2]
    atol = fscal_ref[3]
    ls_step = fscal_ref[4]
    gf = gscal_ref[0]
    gub = gscal_ref[1]
    gap_tol = gscal_ref[2]
    reg_init = gscal_ref[3]
    reg_up = gscal_ref[4]
    reg_down = gscal_ref[5]
    reg_min = gscal_ref[6]
    reg_max = gscal_ref[7]
    a_dec = gscal_ref[8]
    a_inc = gscal_ref[9]
    q_l = qmat_ref[:]
    r_l = rmat_ref[:]
    r2_l = 2.0 * r_l
    g2 = g_ref[:]
    g1 = g_ref[0]
    m_inv = minv_ref[0]
    ju = ju_ref[:]
    ju_t = L.transpose(ju)
    extra = extra_ref[:]
    drag = lane_model.drag_rows(extra)
    i_l = i_ref[:]
    iinv_l = iinv_ref[:]
    u_dim = ju.shape[1]
    box = (lo_ref[:], hi_ref[:]) if use_box else None
    lo = lane_model.ju_lo
    # trailing batch shape: (Bt,) lane layout / (8, 128) supertile
    bshape = q_l.shape[2:]
    dtype = q_l.dtype
    zeros1 = jnp.zeros((1,) + bshape, dtype)
    ez = jnp.concatenate(
        [jnp.zeros((2,) + bshape, dtype), jnp.ones((1,) + bshape, dtype)],
        axis=0,
    )
    # substepped integration: same chain mapping as kernels/fddp.py
    subchain = (
        (lane_model.base.dynamics_step, g1, m_inv, extra, ez)
        if lane_model.substeps > 1
        else None
    )
    n_full = n_stages // chunk
    rem = n_stages % chunk

    def get(r):
        return st_ref[r : r + 1]

    def put(r, val):
        st_ref[r : r + 1] = val

    def conv(cur, new):
        diff = jnp.abs(cur - new)
        return jnp.logical_or(diff < rtol * jnp.abs(cur), diff < atol)

    # ---- DMA plumbing (sync; kernels/stream.py module docstring) ----------
    def copy(src, dst, slot):
        cp = pltpu.make_async_copy(src, dst, sems.at[slot])
        cp.start()
        return cp

    def live_at(s, w):
        if supertile:
            return live_ref.at[pl.ds(s, w), :, :, pl.ds(lane0, TILE)]
        return live_ref.at[pl.ds(s, w), :, pl.ds(lane0, TILE)]

    def des_at(s, w):
        if supertile:
            return des_ref.at[pl.ds(s, w), :, :, pl.ds(dlane0, TILE)]
        return des_ref.at[pl.ds(s, w), :, pl.ds(dlane0, TILE)]

    def load_stages(s, w, with_gains=False, with_defs=False):
        cps = [
            copy(live_at(s, w), tbuf.at[pl.ds(0, w)], 0),
            copy(des_at(s, w), dbuf.at[pl.ds(0, w)], 1),
        ]
        if with_gains:
            cps.append(copy(gains_ref.at[pl.ds(s, w)], gbuf.at[pl.ds(0, w)], 2))
        if with_defs:
            cps.append(copy(defs_ref.at[pl.ds(s, w)], fbuf.at[pl.ds(0, w)], 4))
        for cp in cps:
            cp.wait()

    def store_gains(s, w):
        copy(gbuf.at[pl.ds(0, w)], gains_ref.at[pl.ds(s, w)], 2).wait()

    def store_traj(s, w):
        copy(tbuf.at[pl.ds(0, w)], live_at(s, w), 3).wait()

    def sweep(process, carry0, reverse=False):
        """Run `process(start, width, carry)` over every horizon chunk
        (width static: chunk for full chunks, rem for the tail)."""
        if reverse:
            carry = process(n_full * chunk, rem, carry0) if rem else carry0
            return jax.lax.fori_loop(
                0,
                n_full,
                lambda c, cr: process((n_full - 1 - c) * chunk, chunk, cr),
                carry,
            )
        carry = jax.lax.fori_loop(
            0, n_full, lambda c, cr: process(c * chunk, chunk, cr), carry0
        )
        return process(n_full * chunk, rem, carry) if rem else carry

    # ---- packed-row helpers ------------------------------------------------
    def unpack(row):
        return row[0:4], row[4:7], row[7:13], row[13 : 13 + u_dim]

    def feedback(grow, dx):
        return jnp.concatenate(
            [
                L.dot_lanes(grow[u_dim + 12 * r : u_dim + 12 * r + 12], dx)
                for r in range(u_dim)
            ],
            axis=0,
        )

    def stage_weight(drow):
        return drow[13 + u_dim : 14 + u_dim]  # (1, bt)

    def stage_cost(quat, trans, vel, u, drow):
        dq, dtr, dv, du = unpack(drow)
        dxd = _state_minus(quat, trans, vel, dq, dtr, dv)
        duv = u - du
        c = L.dot_lanes(dxd, L.matvec(q_l, dxd)) + L.dot_lanes(
            duv, L.matvec(r_l, duv)
        )
        return stage_weight(drow) * c if use_weights else c

    def pack_defect(dk):
        return jnp.concatenate(
            [dk, jnp.zeros((4,) + bshape, dtype)], axis=0
        )

    # ---- init: live trajectory := input; seed the TRUE cost ---------------
    if supertile:
        copy(
            tin_ref.at[:, :, :, pl.ds(lane0, TILE)],
            live_ref.at[:, :, :, pl.ds(lane0, TILE)],
            0,
        ).wait()
    else:
        copy(
            tin_ref.at[:, :, pl.ds(lane0, TILE)],
            live_ref.at[:, :, pl.ds(lane0, TILE)],
            0,
        ).wait()
    st_ref[:] = jnp.zeros((_STATE_ROWS,) + bshape, dtype)
    put(_MU, imu_ref[:])
    put(_STATUS, istat_ref[:])
    put(_ITERS, iiter_ref[:])
    put(_DONE, (istat_ref[:] != 0.0).astype(dtype))

    def cchunk(s, w, c):
        load_stages(s, w)

        def cstage(i, cc):
            quat, trans, vel, u = unpack(tbuf[i])
            return cc + stage_cost(quat, trans, vel, u, dbuf[i])

        return jax.lax.fori_loop(0, w, cstage, c)

    put(_COST, sweep(cchunk, zeros1))

    flag_ref[0] = jnp.where(  # all_done (a fully-frozen resumed tile skips)
        jnp.sum((istat_ref[:] == 0.0).astype(dtype)) > 0.5,
        jnp.zeros((), dtype),
        jnp.ones((), dtype),
    )
    flag_ref[2] = jnp.ones((), dtype)  # defects stale (trip 0 computes them)

    def trip(i, tok):
        @pl.when(flag_ref[0] < 0.5)
        def _():
            current = get(_COST)
            done = get(_DONE) > 0.5
            active = jnp.logical_not(done)
            mu = get(_MU)
            quu_reg = quu_reg_floor + mu  # (1, bt): per-lane Levenberg

            @pl.when(flag_ref[2] > 0.5)
            def _():
                put(_GAP, zeros1)

            # ---- fused defects + gap-transported backward sweep (reverse).
            # Fresh trips (some lane accepted last trip / trip 0) recompute
            # the stage defects INSIDE the reverse Riccati sweep (the
            # round-2 kernel paid a separate forward sweep): the defect
            # d_n = f(x_n, u_n) (-) x_{n+1} is stage-independent; interior
            # stages read the in-window successor row, the chunk-boundary
    	    # stage reads the carried first-row state of the (higher) chunk
            # processed just before, and d_{N-1} = 0. Retry trips (no lane
            # accepted — the trajectory is unchanged) skip the recompute and
            # reuse defs_ref + the cached _GAP row (VERDICT r2 #1).
            def bchunk(s, w, carry):
                v_x, v_xx, pbq, pbt, pbv = carry
                load_stages(s, w, with_defs=True)
                q0, t0, v0, _ = unpack(tbuf[0])

                @pl.when(flag_ref[2] > 0.5)
                def _():
                    def dstage(j, tok2):
                        quat, trans, vel, u = unpack(tbuf[j])
                        nq, nt, nv = lane_model.dynamics_step(
                            dt, g1, m_inv, extra, i_l, iinv_l, ez,
                            quat, trans, vel, u,
                        )
                        in_w = j < (w - 1)
                        j1 = jnp.minimum(j + 1, w - 1)
                        sq, st2, sv, _ = unpack(tbuf[j1])
                        sq = jnp.where(in_w, sq, pbq)
                        st2 = jnp.where(in_w, st2, pbt)
                        sv = jnp.where(in_w, sv, pbv)
                        dk = _state_minus(nq, nt, nv, sq, st2, sv)
                        last = (s + j) == (n_stages - 1)
                        dk = jnp.where(last, jnp.zeros_like(dk), dk)
                        fbuf[j] = pack_defect(dk)
                        put(
                            _GAP,
                            jnp.maximum(
                                get(_GAP),
                                jnp.max(jnp.abs(dk), axis=0, keepdims=True),
                            ),
                        )
                        return tok2

                    jax.lax.fori_loop(0, w, dstage, 0)
                    copy(
                        fbuf.at[pl.ds(0, w)], defs_ref.at[pl.ds(s, w)], 4
                    ).wait()

                def bstage(j, cr):
                    idx = w - 1 - j
                    v_x2, v_xx2 = cr
                    quat, trans, vel, u = unpack(tbuf[idx])
                    dq, dtr, dv, du = unpack(dbuf[idx])
                    v_x_eff = v_x2 + L.matvec(v_xx2, fbuf[idx, 0:12])
                    k, big_k, v_x3, v_xx3, _, _ = _riccati_stage(
                        dt, quu_reg, q_l, r2_l, g2, ju, ju_t, i_l, iinv_l,
                        quat, trans, vel, u, dq, dtr, dv, du, v_x_eff, v_xx2,
                        ju_lo_row=lo,
                        box=box,
                        w=stage_weight(dbuf[idx]) if use_weights else None,
                        ddp=ddp,
                        drag=drag,
                        substeps=lane_model.substeps,
                        chain=subchain,
                    )
                    gbuf[idx, 0:u_dim] = k
                    for r in range(u_dim):
                        gbuf[idx, u_dim + 12 * r : u_dim + 12 * r + 12] = big_k[r]
                    return (v_x3, v_xx3)

                v_x, v_xx = jax.lax.fori_loop(0, w, bstage, (v_x, v_xx))
                store_gains(s, w)
                return (v_x, v_xx, q0, t0, v0)

            binit = (
                jnp.zeros((12,) + bshape, dtype),
                jnp.zeros((12, 12) + bshape, dtype),
                jnp.zeros((4,) + bshape, dtype),
                jnp.zeros((3,) + bshape, dtype),
                jnp.zeros((6,) + bshape, dtype),
            )
            sweep(bchunk, binit, reverse=True)
            gap = get(_GAP)

            # ---- rollout sweep (cost-only probes + the apply sweep); the
            # FIRST probe additionally carries the exact quadratic model
            # p' = J_x p + J_u w + d, dJ(alpha) = alpha L1 + alpha^2 L2
            # through the same forward sweep (the round-2 kernel paid a
            # separate pass), persisting L1/L2 in state rows ----------------
            def rollout_sweep(alpha, write_mask, with_qm=False, sat=None):
                def rchunk(s, w, carry):
                    load_stages(s, w, with_gains=True, with_defs=True)

                    def rstage(j, cr):
                        if with_qm:
                            quat, trans, vel, c, p, l1, l2 = cr
                        else:
                            quat, trans, vel, c = cr
                        row = tbuf[j]
                        oq, ot, ov, ou = unpack(row)
                        drow = dbuf[j]
                        grow = gbuf[j]
                        if with_qm:
                            # quadratic model from the LIVE trajectory row;
                            # substepped stage maps chain per-substep blocks
                            # exactly as kernels/fddp.py's rstage0 does
                            dq, dtr, dv, du_d = unpack(drow)
                            if lane_model.substeps > 1:
                                h = dt / lane_model.substeps
                                blocks_list = []
                                sq, st2, sv = oq, ot, ov
                                for si in range(lane_model.substeps):
                                    blocks_list.append(
                                        _stage_jx_blocks(
                                            h, g2, sv, sq, i_l, iinv_l, drag
                                        )
                                    )
                                    if si < lane_model.substeps - 1:
                                        sq, st2, sv = (
                                            lane_model.base.dynamics_step(
                                                h, g1, m_inv, extra, i_l,
                                                iinv_l, ez, sq, st2, sv, ou,
                                            )
                                        )
                            else:
                                blocks_list = [
                                    _stage_jx_blocks(
                                        dt, g2, ov, oq, i_l, iinv_l, drag
                                    )
                                ]
                            _, c_x, c_xx, duv = _stage_cost_diffs(
                                oq, ot, ov, ou, dq, dtr, dv, du_d, q_l,
                                exact=ddp,
                            )
                            r2w = r2_l
                            if use_weights:
                                wrow = stage_weight(drow)
                                c_x = wrow * c_x
                                c_xx = wrow * c_xx
                                r2w = wrow * r2_l
                            c_u = L.matvec(r2w, duv)
                            wv = grow[0:u_dim] + feedback(grow, p)
                            l1 = l1 + L.dot_lanes(c_x, p) + L.dot_lanes(c_u, wv)
                            l2 = l2 + 0.5 * (
                                L.dot_lanes(p, L.matvec(c_xx, p))
                                + L.dot_lanes(wv, L.matvec(r2w, wv))
                            )
                            if lane_model.substeps > 1:
                                bw = jnp.concatenate(
                                    [
                                        jnp.zeros((lo,) + bshape, dtype),
                                        L.matvec(ju[lo:12], wv),
                                    ],
                                    axis=0,
                                )
                                jw = bw
                                for b in blocks_list[1:]:
                                    jw = _jx_vec(jw, *b) + bw
                                pc = p
                                for b in blocks_list:
                                    pc = _jx_vec(pc, *b)
                                p2 = pc + jw
                            else:
                                p2 = _jx_vec(p, *blocks_list[0])
                                p2 = jnp.concatenate(
                                    [
                                        p2[0:lo],
                                        p2[lo:12] + L.matvec(ju[lo:12], wv),
                                    ],
                                    axis=0,
                                )
                            p = p2 + fbuf[j, 0:12]
                        first = (s + j) == 0
                        quat = jnp.where(first, oq, quat)
                        trans = jnp.where(first, ot, trans)
                        vel = jnp.where(first, ov, vel)
                        dx = _state_minus(quat, trans, vel, oq, ot, ov)
                        u = ou + alpha * grow[0:u_dim] + feedback(grow, dx)
                        if use_box:
                            u = jnp.clip(u, lo_ref[:], hi_ref[:])
                        # probes after the first run the frozen-saturating
                        # fold — the shared op order of
                        # solver/fddp._saturating_stage_cost_add (lane
                        # parity with the VMEM kernel / XLA line search)
                        cs = stage_cost(quat, trans, vel, u, drow)
                        c = (
                            c + cs
                            if sat is None
                            else _saturating_stage_cost_add(c, cs, *sat)
                        )
                        if write_mask is not None:
                            tbuf[j, 0:4] = jnp.where(write_mask, quat, oq)
                            tbuf[j, 4:7] = jnp.where(write_mask, trans, ot)
                            tbuf[j, 7:13] = jnp.where(write_mask, vel, ov)
                            tbuf[j, 13 : 13 + u_dim] = jnp.where(
                                write_mask, u, ou
                            )
                        qn, tn, vn = lane_model.dynamics_step(
                            dt, g1, m_inv, extra, i_l, iinv_l, ez,
                            quat, trans, vel, u,
                        )
                        # gap contraction (solver/fddp.rollout_gap)
                        tau = -(1.0 - alpha) * fbuf[j, 0:12]
                        qe, te = L.se3_exp(tau[0:6])
                        qn, tn = L.se3_multiply(qn, tn, qe, te)
                        vn = vn + tau[6:12]
                        if with_qm:
                            return (qn, tn, vn, c, p, l1, l2)
                        return (qn, tn, vn, c)

                    carry = jax.lax.fori_loop(0, w, rstage, carry)
                    if write_mask is not None:
                        store_traj(s, w)
                    return carry

                rinit = (
                    jnp.zeros((4,) + bshape, dtype),
                    jnp.zeros((3,) + bshape, dtype),
                    jnp.zeros((6,) + bshape, dtype),
                    zeros1,
                )
                if with_qm:
                    rinit = rinit + (
                        jnp.zeros((12,) + bshape, dtype), zeros1, zeros1,
                    )
                    out = sweep(rchunk, rinit)
                    return out[3], out[5], out[6]
                return sweep(rchunk, rinit)[3]

            # ---- Goldstein line search: cost-only probes (probe 0 fused
            # with the quadratic model) --------------------------------------
            put(_ALPHA, jnp.ones((1,) + bshape, dtype))
            put(_ACCEPTED, jnp.zeros((1,) + bshape, dtype))
            put(_BESTC, current)
            flag_ref[1] = jnp.sum(active.astype(dtype))

            cand0, l1, l2 = rollout_sweep(get(_ALPHA), None, with_qm=True)
            put(_L1, l1)
            put(_L2, l2)
            still0 = _goldstein_probe_commit(
                get, put, gf, gub, ls_step, active, current, l1, l2,
                cand0, active, jnp.zeros((1,) + bshape, bool),
                get(_ALPHA),
            )
            flag_ref[1] = jnp.sum(still0.astype(dtype))

            def ls_trip(j, tok2):
                @pl.when(flag_ref[1] > 0.5)
                def _():
                    accepted = get(_ACCEPTED) > 0.5
                    pending = jnp.logical_and(active, jnp.logical_not(accepted))
                    alpha = get(_ALPHA)
                    l1v = get(_L1)
                    l2v = get(_L2)
                    dj = alpha * l1v + alpha * alpha * l2v
                    gdj = jnp.where(dj <= 0.0, gf, gub) * dj
                    cand_cost = rollout_sweep(
                        alpha, None,
                        sat=(gdj, current, _probe_cap(current + gdj, current)),
                    )
                    still_pending = _goldstein_probe_commit(
                        get, put, gf, gub, ls_step, active, current,
                        l1v, l2v, cand_cost, pending, accepted,
                        alpha,
                    )
                    flag_ref[1] = jnp.sum(still_pending.astype(dtype))

                return tok2

            jax.lax.fori_loop(1, ls_max_iters, ls_trip, 0)

            # ---- apply sweep: merge ACCEPTED lanes at their frozen alpha
            # (rejected lanes keep the trajectory for the mu retry) ---------
            take = jnp.logical_and(active, get(_ACCEPTED) > 0.5)

            @pl.when(jnp.sum(take.astype(dtype)) > 0.5)
            def _():
                rollout_sweep(get(_ALPHA), take)

            n_open, n_take = _fddp_trip_close(
                get, put, conv, dtype, active, done, current, mu, gap,
                gap_tol, reg_init, reg_up, reg_down, reg_min, reg_max,
                a_dec, a_inc,
            )
            flag_ref[0] = jnp.where(
                n_open < 0.5, jnp.ones((), dtype), jnp.zeros((), dtype)
            )
            flag_ref[2] = jnp.where(
                n_take > 0.5, jnp.ones((), dtype), jnp.zeros((), dtype)
            )

        return tok

    jax.lax.fori_loop(0, max_iters, trip, 0)

    ocost_ref[:] = get(_COST)
    oiter_ref[:] = get(_ITERS)
    ostat_ref[:] = get(_STATUS)
    omu_ref[:] = get(_MU)


@functools.partial(
    jax.jit,
    static_argnames=(
        "n",
        "batch",
        "max_iters",
        "ls_max_iters",
        "chunk",
        "lane_model",
        "use_weights",
        "use_box",
        "ddp",
        "cost_batched",
        "params_batched",
        "interpret",
        "supertile",
    ),
)
def _stream_fddp_call(
    fscal,
    gscal,
    traj_packed,
    des_packed,
    q_mat,
    r_mat,
    g,
    m_inv,
    ju,
    extra,
    inertia,
    inertia_inv,
    lo,
    hi,
    imu,
    istat,
    iiter,
    n,
    batch,
    max_iters,
    ls_max_iters,
    chunk,
    lane_model,
    use_weights,
    use_box,
    ddp,
    cost_batched,
    params_batched,
    interpret,
    supertile=False,
):
    dtype = traj_packed.dtype
    w = min(chunk, n)
    u = lane_model.u_dim
    tr = traj_rows(u)
    dr = des_rows(u, use_weights)
    gr = gain_rows(u)
    extra_core = extra.shape[:-1]
    bound_core = lo.shape[:-1]  # (u,) real bounds / (1,) dummy
    box_batched = lo.shape[-1] != TILE
    # desired stream (targets + weights) vs Q/R: independent flags
    # (CostBatched; see kernels/stream.py)
    stream_b = cost_batched.des or (use_weights and cost_batched.w)
    if supertile:
        n_tiles = batch // SUPER_TILE
        btile = (SUPER_SUB, TILE)

        def prep(a):
            if a.shape[-1] == TILE and batch != TILE:
                return jnp.broadcast_to(
                    a[..., None, :], a.shape[:-1] + btile
                )
            return _to_super(a)

        (
            q_mat, r_mat, g, m_inv, ju, extra, inertia, inertia_inv, lo,
            hi, imu, istat, iiter,
        ) = map(
            prep,
            (
                q_mat, r_mat, g, m_inv, ju, extra, inertia, inertia_inv,
                lo, hi, imu, istat, iiter,
            ),
        )
        traj_packed = _to_super(traj_packed)
        des_packed = (
            _to_super(des_packed)
            if des_packed.shape[-1] != TILE
            else jnp.broadcast_to(
                des_packed[..., None, :], des_packed.shape[:-1] + btile
            )
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
        scratch_tail = btile
    else:
        n_tiles = batch // TILE
        btile = (TILE,)
        lane_block = lambda shape: pl.BlockSpec(
            shape + (TILE,),
            lambda i: (0,) * len(shape) + (i,),
            memory_space=pltpu.VMEM,
        )
        fixed_block = lambda shape: pl.BlockSpec(
            shape + (TILE,), lambda i: (0,) * (len(shape) + 1), memory_space=pltpu.VMEM
        )
        obatch = (batch,)
        scratch_tail = (TILE,)
    qr_block = lane_block if cost_batched.qr else fixed_block
    param_block = lane_block if params_batched else fixed_block
    hbm = pl.BlockSpec(memory_space=pltpu.HBM)
    # bounds may be shared (one (., TILE) broadcast tile; at a single tile
    # the two index maps coincide, so shape inference is unambiguous) or
    # per-scenario ((., B) lane tiles — backward._prep_limits)
    box_block = (lane_block if box_batched else fixed_block)(bound_core)
    kernel = functools.partial(
        _stream_fddp_kernel,
        n,
        max_iters,
        ls_max_iters,
        w,
        stream_b,
        lane_model,
        use_weights,
        use_box,
        ddp,
        supertile,
    )
    live, _, _, ocost, oiter, ostat, omu = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            hbm,
            hbm,
            qr_block((12, 12)),
            qr_block((u, u)),
            param_block((1, 1)),
            param_block((1, 1)),
            param_block((12, u)),
            param_block(extra_core),
            param_block((3, 3)),
            param_block((3, 3)),
            box_block,
            box_block,
            lane_block((1,)),
            lane_block((1,)),
            lane_block((1,)),
        ],
        out_specs=[
            hbm,
            hbm,
            hbm,
            lane_block((1,)),
            lane_block((1,)),
            lane_block((1,)),
            lane_block((1,)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(
                (n, tr) + (btile[:-1] + (batch // SUPER_SUB,) if supertile
                           else (batch,)),
                dtype,
            ),
            jax.ShapeDtypeStruct((n, gr) + scratch_tail, dtype),
            jax.ShapeDtypeStruct((n, DEFECT_ROWS) + scratch_tail, dtype),
            jax.ShapeDtypeStruct((1,) + obatch, dtype),
            jax.ShapeDtypeStruct((1,) + obatch, dtype),
            jax.ShapeDtypeStruct((1,) + obatch, dtype),
            jax.ShapeDtypeStruct((1,) + obatch, dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((w, tr) + scratch_tail, dtype),
            pltpu.VMEM((w, dr) + scratch_tail, dtype),
            pltpu.VMEM((w, gr) + scratch_tail, dtype),
            pltpu.VMEM((w, DEFECT_ROWS) + scratch_tail, dtype),
            pltpu.VMEM((_STATE_ROWS,) + scratch_tail, dtype),
            pltpu.SMEM((3,), dtype),
            pltpu.SemaphoreType.DMA((6,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        fscal,
        gscal,
        traj_packed,
        des_packed,
        q_mat,
        r_mat,
        g,
        m_inv,
        ju,
        extra,
        inertia,
        inertia_inv,
        lo,
        hi,
        imu,
        istat,
        iiter,
    )
    if supertile:
        live = _from_super(live, batch)
        ocost, oiter, ostat, omu = (
            _from_super(a, batch) for a in (ocost, oiter, ostat, omu)
        )
    return live, ocost, oiter, ostat, omu


def solve_fddp_streamed(
    params,
    cost,
    traj,
    dt_s,
    options,
    fddp_options=None,
    interpret=False,
    chunk=DEFAULT_CHUNK,
    model=None,
    limits=None,
    ddp=False,
    initial_mu=None,
    initial_status=None,
    initial_iters=None,
    return_mu=False,
    supertile=False,
):
    """Streamed whole-solve FDDP for (B, N, ...) trajectories, B a multiple
    of 128, ANY horizon (HBM-bound). Lane-for-lane identical to
    kernels/fddp.solve_fddp_fused / vmap(solver.fddp.solve_fddp);
    `ddp=True` adds the analytic exact-DDP curvature (see
    kernels/fddp.solve_fddp_fused); `limits=(lo, hi)` runs the box-QP
    stage + clamped gap rollouts; same tuple layout (Trajectory,
    cost (B,), iterations (B,) i32, status (B,) i32)."""
    from ..lie.se3 import SE3
    from ..models.quadrotor import State
    from ..solver.fddp import FDDPOptions
    from ..solver.ilqr import Trajectory
    from .models import lane_model_for

    fo = FDDPOptions() if fddp_options is None else fddp_options
    lm = lane_model_for(params, model)
    controls = traj.controls
    batch, n = controls.shape[0], controls.shape[1]
    if batch % TILE != 0:
        raise ValueError(f"batch {batch} must be a multiple of {TILE}")
    if supertile and batch % SUPER_TILE != 0:
        raise ValueError(
            f"supertile=True needs batch a multiple of {SUPER_TILE}, "
            f"got {batch}"
        )
    if supertile and chunk == DEFAULT_CHUNK:
        # supertile windows are 8x per stage: shrink the default chunk to
        # stay in the same VMEM envelope (explicit chunks are honored)
        chunk = DEFAULT_CHUNK // 4
    dtype = controls.dtype
    ls = options.line_search_params
    if int(ls.max_iters) < 1:
        raise ValueError(
            "line_search_params.max_iters must be >= 1 on the streamed "
            "FDDP kernel"
        )
    cc = options.convergence_criteria

    des_q, des_t, des_v, des_u, q_mat, r_mat, w_op, cost_batched = _prep_cost(
        cost, batch, dtype, r_scale=1.0
    )
    use_weights = cost.stage_weights is not None
    g, m_inv, ju, extra, inertia, inertia_inv, params_batched = lm.prep_params(
        params, dt_s, dtype
    )
    from .backward import _prep_limits

    lo_b, hi_b, use_box, _ = _prep_limits(limits, lm.u_dim, dtype)
    fscal = jnp.asarray(
        [dt_s, options.quu_reg, cc.rtol, cc.atol, ls.step_update, 0.0, 0.0, 0.0],
        dtype,
    )
    from ..solver.fddp import resolve_gap_tol

    gscal = jnp.asarray(
        [
            fo.goldstein_frac,
            fo.goldstein_ub,
            resolve_gap_tol(fo, dtype),
            fo.reg_init,
            fo.reg_scale_up,
            fo.reg_scale_down,
            fo.reg_min,
            fo.reg_max,
            fo.alpha_dec,
            fo.alpha_inc,
            0.0,
            0.0,
        ],
        dtype,
    )
    traj_packed = _pack_stages(
        _to_lanes(traj.states.pose.quat),
        _to_lanes(traj.states.pose.trans),
        _to_lanes(traj.states.vel),
        _to_lanes(controls),
    )
    des_packed = _pack_stages(
        *_up_stream(
            (des_q, des_t, des_v, des_u),
            w_op if use_weights else None,
            cost_batched, batch,
        )
    )

    def lane_row(a):
        if a is None:
            return jnp.zeros((1, batch), dtype)
        return jnp.asarray(a, dtype).reshape(1, batch)

    live, ocost, oiter, ostat, omu = _stream_fddp_call(
        fscal,
        gscal,
        traj_packed,
        des_packed,
        q_mat,
        r_mat,
        g,
        m_inv,
        ju,
        extra,
        inertia,
        inertia_inv,
        lo_b,
        hi_b,
        lane_row(initial_mu),
        lane_row(initial_status),
        lane_row(initial_iters),
        n,
        batch,
        int(cc.max_iters),
        int(ls.max_iters),
        chunk,
        lm,
        use_weights,
        use_box,
        ddp,
        cost_batched,
        params_batched,
        interpret,
        supertile,
    )
    unpack = lambda lo_, hi_: jnp.moveaxis(live[:, lo_:hi_, :], -1, 0)
    new_traj = Trajectory(
        times=traj.times,
        states=State(
            pose=SE3(quat=unpack(0, 4), trans=unpack(4, 7)),
            vel=unpack(7, 13),
        ),
        controls=unpack(13, 13 + lm.u_dim),
    )
    out = (
        new_traj,
        ocost[0],
        oiter[0].astype(jnp.int32),
        ostat[0].astype(jnp.int32),
    )
    return out + (omu[0],) if return_mu else out
