"""Streamed whole-solve kernel: unbounded-horizon iLQR at kernel speed.

The VMEM-resident whole-solve kernel (kernels/solve.py) holds every horizon
stage of the trajectory, desired trajectory, gains, and line-search
candidates on-chip, which caps it at MAX_HORIZON (~256) stages. Beyond that
the only engines were the batch-level kernel loop (same per-tile VMEM bound)
and the ~30x slower XLA paths. This kernel removes the bound: per-stage data
stays in HBM and is DMA'd through a fixed VMEM window of `chunk` stages, so
the horizon is limited only by HBM.

Why synchronous (non-double-buffered) DMA is enough: the solve is
compute-bound by ~30x. Per 64-stage chunk the backward pass does
~13.2 kFLOP/lane/stage * 128 lanes * 64 = 108 MFLOP (~170 us at the engine's
measured 640 GFLOP/s) while the chunk's DMA traffic is ~2.6 MB (~5 us at the
measured 554 GB/s). Overlap would recover <3%; the complexity is not worth
it (BENCH_LOCAL.md roofline numbers).

Design differences vs the VMEM-resident kernel (same reference semantics,
ilqr.hh:53-205):

  * the live trajectory lives in the HBM OUTPUT buffer (initialized from
    the input by one HBM->HBM DMA per 128-lane tile) and is re-streamed
    each sweep;
  * line-search candidates are never stored: the line search runs
    cost-only rollout sweeps, and one final APPLY sweep re-rolls each lane
    at its final per-lane alpha (accepted lanes froze their alpha at
    acceptance, exhausted lanes keep the last tried alpha — identical to
    the stored-candidate semantics, deterministically recomputed) and
    merges candidate stages into the live buffer for active lanes;
  * gains (k, K) stream to a per-tile HBM scratch buffer sized
    (N, 56, 128) that sequential grid steps reuse (dimension_semantics
    "arbitrary" pins the grid to sequential execution).

Packed stage layouts (Mosaic requires DMA slice shapes aligned to the
(8, 128) f32 tiling on the minor two dims, so row counts pad to multiples
of 8; `u` is the model's control dimension — 4 for the quadrotor, giving
the historical 24/56-row layouts):

  trajectory / desired  (N, ceil8(13+u), B):  q 0:4 | t 4:7 | v 7:13 |
                                              u 13:13+u | pad
  gains                 (N, ceil8(13u), Bt):  k 0:u | K row r at
                                              u+12r:u+12r+12 | pad

The per-stage math is IMPORTED from kernels/backward.py (_riccati_stage)
and kernels/rollout.py (_state_minus, _dynamics_step) — one definition
shared with every other kernel, so the f64 interpret parity contract
extends here automatically. Per-lane solver state rows and the trip/line-
search predication structure mirror kernels/solve.py exactly.
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
from .solve import (
    _ACCEPTED,
    _ALPHA,
    _BESTC,
    _COST,
    _DONE,
    _ITERS,
    _STATE_ROWS,
    _STATUS,
    _ls_probe_commit,
    _trip_close,
    _trip_gate,
)

# Spare state row: the alpha of the LAST TRIED probe per lane. The VMEM
# kernel keeps the last probe's rollout in its candidate buffers, so a
# lane whose line search exhausts still merges that trajectory; here
# candidates are recomputed, and _ALPHA has already been backtracked once
# more after the final failed probe — the apply sweep must re-roll at the
# tried value, not the backtracked one.
_TRIED = 7
assert _TRIED < _STATE_ROWS

DEFAULT_CHUNK = 64


def _ceil8(x):
    """Round up to the f32 sublane tile (Mosaic DMA row alignment)."""
    return -(-x // 8) * 8


def traj_rows(u_dim):
    """Packed trajectory rows: q(4) + t(3) + v(6) + u, padded to 8."""
    return _ceil8(13 + u_dim)


def gain_rows(u_dim):
    """Packed gain rows: k(u) + K(u x 12), padded to 8."""
    return _ceil8(13 * u_dim)


def des_rows(u_dim, use_weights):
    """Packed DESIRED rows: the trajectory layout, plus one stage-weight row
    at index 13+u when per-stage cost weights are active
    (costs/quadratic.stage_weights) — weights ride the desired stream."""
    return _ceil8(14 + u_dim) if use_weights else traj_rows(u_dim)


def _stream_kernel(
    n_stages,
    max_iters,
    ls_max_iters,
    continuation,
    chunk,
    cost_batched,
    lane_model,  # model family descriptor (kernels/models.py)
    use_weights,  # static: per-stage cost weights ride the desired stream
    use_box,  # static: control limits active (lo/hi refs read)
    supertile,  # static: packed arrays carry an extra (8,) sublane dim
    fscal_ref,  # SMEM (8,): [dt, quu_reg, rtol, atol, ls_step, ls_frac, 0, 0]
    tin_ref,  # HBM (N, TR, B) packed initial trajectory (TR = traj_rows(u))
    des_ref,  # HBM (N, TR, Bd) packed desired (Bd = B batched / TILE shared)
    qmat_ref,  # VMEM (12, 12, Bt) cost Q
    rmat_ref,  # VMEM (u, u, Bt) cost R
    g_ref,  # VMEM (1, 1, Bt) params (broadcast or per-lane)
    minv_ref,
    ju_ref,  # (12, u, Bt)
    extra_ref,  # per-model operand (quadrotor: (3, u, Bt) I^-1 @ moment_arms)
    i_ref,  # (3, 3, Bt)
    iinv_ref,  # (3, 3, Bt)
    lo_ref,  # (u, Bt) control lower bounds ((1, Bt) dummy when !use_box)
    hi_ref,  # (u, Bt) upper bounds
    live_ref,  # out HBM (N, TR, B): live/final packed trajectory
    gains_ref,  # out HBM (N, GR, TILE): per-tile gains scratch (reused)
    ocost_ref,  # out VMEM (1, Bt)
    oiter_ref,  # out VMEM (1, Bt) f32 (cast by the wrapper)
    ostat_ref,  # out VMEM (1, Bt) f32 STATUS_* codes
    tbuf,  # scratch VMEM (W, TR, TILE): trajectory window
    dbuf,  # scratch VMEM (W, TR, TILE): desired window
    gbuf,  # scratch VMEM (W, GR, TILE): gains window
    st_ref,  # scratch VMEM (8, TILE): per-lane solver state rows
    flag_ref,  # scratch SMEM (2,): [all_done, ls_pending_count]
    sems,  # DMA semaphores (4,)
):
    tile = pl.program_id(0)
    lane0 = tile * TILE
    dlane0 = lane0 if cost_batched else 0

    dt = fscal_ref[0]
    quu_reg = fscal_ref[1]
    rtol = fscal_ref[2]
    atol = fscal_ref[3]
    ls_step = fscal_ref[4]
    ls_frac = fscal_ref[5]
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
    u_dim = ju.shape[1]  # control dimension (static)
    box = (lo_ref[:], hi_ref[:]) if use_box else None
    # trailing batch shape: (Bt,) lane layout / (8, 128) supertile — the
    # body is layout-agnostic (kernels/solve.py pattern)
    bshape = q_l.shape[2:]
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
    n_full = n_stages // chunk
    rem = n_stages % chunk

    def get(r):
        return st_ref[r : r + 1]

    def put(r, val):
        st_ref[r : r + 1] = val

    def conv(cur, new):
        diff = jnp.abs(cur - new)
        return jnp.logical_or(diff < rtol * jnp.abs(cur), diff < atol)

    # ---- DMA plumbing (sync: start + wait; see module docstring).
    # Under supertile the packed HBM arrays carry an extra (8,) sublane
    # dim before the lane dim, so the tile slice gains a full-dim `:`.
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

    def load_stages(s, w, with_gains):
        cps = [
            copy(live_at(s, w), tbuf.at[pl.ds(0, w)], 0),
            copy(des_at(s, w), dbuf.at[pl.ds(0, w)], 1),
        ]
        if with_gains:
            cps.append(
                copy(gains_ref.at[pl.ds(s, w)], gbuf.at[pl.ds(0, w)], 2)
            )
        for cp in cps:
            cp.wait()

    def store_gains(s, w):
        copy(gbuf.at[pl.ds(0, w)], gains_ref.at[pl.ds(s, w)], 2).wait()

    def store_traj(s, w):
        copy(tbuf.at[pl.ds(0, w)], live_at(s, w), 3).wait()

    def sweep(process, carry0, reverse=False):
        """Run `process(start, width, carry)` over every horizon chunk.
        `width` is Python-static (chunk for full chunks, rem for the tail),
        `start` is traced."""
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

    # ---- packed-row helpers ---------------------------------------------
    def unpack(row):
        return row[0:4], row[4:7], row[7:13], row[13 : 13 + u_dim]

    def feedback(grow, dx):
        """K @ dx from a packed gains row: (GR, bt), (12, bt) -> (u, bt)."""
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

    # ---- init: live trajectory := input (one HBM->HBM DMA per tile) ------
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

    if continuation or max_iters == 0:
        # the input trajectory is feasible: its true cost seeds the loop
        def cchunk(s, w, c):
            load_stages(s, w, with_gains=False)

            def cstage(i, cc):
                row = tbuf[i]
                quat, trans, vel, u = unpack(row)
                return cc + stage_cost(quat, trans, vel, u, dbuf[i])

            return jax.lax.fori_loop(0, w, cstage, c)

        put(_COST, sweep(cchunk, zeros1))

    flag_ref[0] = jnp.zeros((), dtype)  # all_done

    def trip(i, tok):
        @pl.when(flag_ref[0] < 0.5)
        def _():
            # ---- backward sweep (ilqr.hh:97-147), reverse chunks ----
            def bchunk(s, w, carry):
                load_stages(s, w, with_gains=False)

                def bstage(j, cr):
                    idx = w - 1 - j
                    v_x, v_xx, qutk, ktquuk = cr
                    row = tbuf[idx]
                    drow = dbuf[idx]
                    quat, trans, vel, u = unpack(row)
                    dq, dtr, dv, du = unpack(drow)
                    k, big_k, v_x2, v_xx2, qi, ki = _riccati_stage(
                        dt, quu_reg, q_l, r2_l, g2, ju, ju_t, i_l, iinv_l,
                        quat, trans, vel, u, dq, dtr, dv, du, v_x, v_xx,
                        ju_lo_row=lane_model.ju_lo,
                        drag=drag,
                        substeps=lane_model.substeps,
                        chain=chain,
                        box=box,
                        w=stage_weight(drow) if use_weights else None,
                    )
                    gbuf[idx, 0:u_dim] = k
                    for r in range(u_dim):
                        gbuf[idx, u_dim + 12 * r : u_dim + 12 * r + 12] = big_k[r]
                    return (v_x2, v_xx2, qutk + qi, ktquuk + ki)

                carry = jax.lax.fori_loop(0, w, bstage, carry)
                store_gains(s, w)
                return carry

            binit = (
                jnp.zeros((12,) + bshape, dtype),
                jnp.zeros((12, 12) + bshape, dtype),
                zeros1,
                zeros1,
            )
            _, _, qutk, ktquuk = sweep(bchunk, binit, reverse=True)

            current, done, li, li_pos, pre_conv, active = _trip_gate(
                get, conv, i, continuation, qutk, ktquuk
            )

            # ---- rollout sweep (shared by line search and apply) ----
            def rollout_sweep(alpha, write_mask):
                """Roll every lane at its per-lane alpha. write_mask=None:
                cost-only (line-search probe). Otherwise merge candidate
                stages into the live buffer for write_mask lanes."""

                def rchunk(s, w, carry):
                    load_stages(s, w, with_gains=True)

                    def rstage(j, cr):
                        quat, trans, vel, c = cr
                        row = tbuf[j]
                        oq, ot, ov, ou = unpack(row)
                        first = (s + j) == 0
                        quat = jnp.where(first, oq, quat)
                        trans = jnp.where(first, ot, trans)
                        vel = jnp.where(first, ov, vel)
                        dx = _state_minus(quat, trans, vel, oq, ot, ov)
                        grow = gbuf[j]
                        u = ou + alpha * grow[0:u_dim] + feedback(grow, dx)
                        if use_box:
                            u = jnp.clip(u, lo_ref[:], hi_ref[:])
                        c = c + stage_cost(quat, trans, vel, u, dbuf[j])
                        if write_mask is not None:
                            tbuf[j, 0:4] = jnp.where(write_mask, quat, oq)
                            tbuf[j, 4:7] = jnp.where(write_mask, trans, ot)
                            tbuf[j, 7:13] = jnp.where(write_mask, vel, ov)
                            tbuf[j, 13 : 13 + u_dim] = jnp.where(
                                write_mask, u, ou
                            )
                        return lane_model.dynamics_step(
                            dt, g1, m_inv, extra, i_l, iinv_l, ez,
                            quat, trans, vel, u,
                        ) + (c,)

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
                return sweep(rchunk, rinit)[3]

            # ---- line search (ilqr.hh:174-194): cost-only probes ----
            put(_ALPHA, jnp.ones((1,) + bshape, dtype))
            put(_TRIED, jnp.ones((1,) + bshape, dtype))
            put(_ACCEPTED, jnp.zeros((1,) + bshape, dtype))
            put(_BESTC, current)
            flag_ref[1] = jnp.sum(active.astype(dtype))

            def ls_trip(j, tok2):
                @pl.when(flag_ref[1] > 0.5)
                def _():
                    accepted = get(_ACCEPTED) > 0.5
                    pending = jnp.logical_and(active, jnp.logical_not(accepted))
                    alpha = get(_ALPHA)
                    cand_cost = rollout_sweep(alpha, None)
                    # candidates are recomputed, not stored: remember the
                    # alpha actually probed (the apply sweep re-rolls at it)
                    put(_TRIED, jnp.where(pending, alpha, get(_TRIED)))
                    still_pending = _ls_probe_commit(
                        get, put, ls_frac, ls_step, li, active, current,
                        qutk, ktquuk, cand_cost, pending, accepted, alpha,
                    )
                    flag_ref[1] = jnp.sum(still_pending.astype(dtype))

                return tok2

            jax.lax.fori_loop(0, ls_max_iters, ls_trip, 0)

            # ---- apply sweep: re-roll each lane at the alpha of its LAST
            # TRIED probe (== the accepted alpha for accepted lanes) and
            # merge candidates for active lanes (see module docstring) ----
            rollout_sweep(get(_TRIED), active)

            n_open = _trip_close(
                get, put, conv, dtype, li_pos, pre_conv, active, done, current
            )
            flag_ref[0] = jnp.where(
                n_open < 0.5, jnp.ones((), dtype), jnp.zeros((), dtype)
            )

        return tok

    jax.lax.fori_loop(0, max_iters, trip, 0)

    ocost_ref[:] = get(_COST)
    oiter_ref[:] = get(_ITERS)
    ostat_ref[:] = get(_STATUS)


@functools.partial(
    jax.jit,
    static_argnames=(
        "n",
        "batch",
        "max_iters",
        "ls_max_iters",
        "continuation",
        "chunk",
        "lane_model",
        "use_weights",
        "use_box",
        "cost_batched",
        "params_batched",
        "interpret",
        "supertile",
    ),
)
def _stream_call(
    fscal,
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
    n,
    batch,
    max_iters,
    ls_max_iters,
    continuation,
    chunk,
    lane_model,
    use_weights,
    use_box,
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
    extra_core = extra.shape[:-1]  # per-model operand core dims
    bound_core = lo.shape[:-1]  # (u,) real bounds / (1,) dummy
    box_batched = lo.shape[-1] != TILE
    # the packed desired STREAM carries targets + stage weights, so it is
    # per-lane iff either group is (the wrapper broadcast-upped the other);
    # Q/R ride their own VMEM blocks with their own flag (CostBatched)
    stream_b = cost_batched.des or (use_weights and cost_batched.w)
    if supertile:
        n_tiles = batch // SUPER_TILE
        btile = (SUPER_SUB, TILE)

        def prep(a):
            # VMEM operands: broadcast tiles materialize across sublanes
            if a.shape[-1] == TILE and batch != TILE:
                return jnp.broadcast_to(
                    a[..., None, :], a.shape[:-1] + btile
                )
            return _to_super(a)

        q_mat, r_mat, g, m_inv, ju, extra, inertia, inertia_inv, lo, hi = (
            map(
                prep,
                (
                    q_mat, r_mat, g, m_inv, ju, extra, inertia,
                    inertia_inv, lo, hi,
                ),
            )
        )
        # packed HBM streams gain the sublane dim: (N, rows, 8, lanes)
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
        _stream_kernel,
        n,
        max_iters,
        ls_max_iters,
        continuation,
        w,
        stream_b,
        lane_model,
        use_weights,
        use_box,
        supertile,
    )
    live, _, ocost, oiter, ostat = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
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
        ],
        out_specs=[
            hbm,
            hbm,
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
            jax.ShapeDtypeStruct((1,) + obatch, dtype),
            jax.ShapeDtypeStruct((1,) + obatch, dtype),
            jax.ShapeDtypeStruct((1,) + obatch, dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((w, tr) + scratch_tail, dtype),
            pltpu.VMEM((w, dr) + scratch_tail, dtype),
            pltpu.VMEM((w, gr) + scratch_tail, dtype),
            pltpu.VMEM((_STATE_ROWS,) + scratch_tail, dtype),
            pltpu.SMEM((2,), dtype),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        fscal,
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
    )
    if supertile:
        # (N, TR, 8, S*128) -> (N, TR, batch); lane rows likewise
        live = _from_super(live, batch)
        ocost, oiter, ostat = (
            _from_super(a, batch) for a in (ocost, oiter, ostat)
        )
    return live, ocost, oiter, ostat


def _up_stream(des_ops, w_op, cb, batch):
    """The packed desired stream carries targets AND stage weights: if only
    ONE group is per-scenario (CostBatched.des != .w), broadcast the shared
    group's (..., TILE) tiles up to (..., B) so the stream packs at one
    width. No-op when the flags agree."""
    stream_b = cb.des or (w_op is not None and cb.w)
    if not stream_b or batch == TILE:
        return des_ops + (w_op,)

    def up(a):
        if a is None or a.shape[-1] == batch:
            return a
        return jnp.broadcast_to(a[..., :1], a.shape[:-1] + (batch,))

    return tuple(up(a) for a in des_ops) + (up(w_op),)


def _pack_stages(q, t, v, u, w=None):
    """Lane-layout stage arrays -> packed (N, rows, B) (see module
    docstring). `w` ((N, 1, B) stage weights) appends at row 13+u and pads
    to des_rows — DESIRED packing only."""
    n, _, b = q.shape
    u_dim = u.shape[1]
    rows = des_rows(u_dim, w is not None)
    parts = [q, t, v, u]
    used = 13 + u_dim
    if w is not None:
        parts.append(jnp.broadcast_to(w, (n, 1, b)))
        used += 1
    parts.append(jnp.zeros((n, rows - used, b), q.dtype))
    return jnp.concatenate(parts, axis=1)


def solve_fused_streamed(
    params,
    cost,
    traj,
    dt_s,
    options,
    interpret=False,
    continuation=False,
    chunk=DEFAULT_CHUNK,
    model=None,
    limits=None,
    supertile=False,
):
    """Streamed whole-solve iLQR for (B, N, ...) trajectories, B a multiple
    of 128, any horizon (HBM-bound rather than VMEM-bound). Lane-for-lane
    identical to solve_fused_whole / solve_batch_fused; `model` selects the
    model family (kernels/models.py lane_model_for); returns the same
    tuple layout (Trajectory, cost (B,), iterations (B,) i32, status (B,)
    i32). `limits=(lo, hi)` (scalars / (u,) arrays shared across the batch, or
    (B, u) per scenario) switches the stage gain solve to the
    projected-Newton box-QP and clamps every rollout control
    (solver/constrained.py semantics)."""
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
            f"supertile=True needs batch a multiple of {SUPER_TILE}, "
            f"got {batch}"
        )
    if supertile and chunk == DEFAULT_CHUNK:
        # the supertile window is 8x per stage; shrink the default chunk
        # so the windows stay in the same VMEM envelope (any explicit
        # chunk is honored verbatim)
        chunk = DEFAULT_CHUNK // 4
    dtype = controls.dtype
    ls = options.line_search_params
    if int(ls.max_iters) < 1:
        # same constraint as kernels/solve.py: trip 0's forced full step is
        # a forced-accept probe; zero probes would silently skip it
        raise ValueError(
            "line_search_params.max_iters must be >= 1 on the streamed "
            "whole-solve kernel; use solver.batched.solve_batch_fused (or "
            "solve_batch_latency, which routes there) for zero-probe runs"
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

    live, ocost, oiter, ostat = _stream_call(
        fscal,
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
        n,
        batch,
        int(cc.max_iters),
        int(ls.max_iters),
        continuation,
        chunk,
        lm,
        use_weights,
        use_box,
        cost_batched,
        params_batched,
        interpret,
        supertile,
    )
    unpack = lambda lo, hi: jnp.moveaxis(live[:, lo:hi, :], -1, 0)
    new_traj = Trajectory(
        times=traj.times,
        states=State(
            pose=SE3(quat=unpack(0, 4), trans=unpack(4, 7)),
            vel=unpack(7, 13),
        ),
        controls=unpack(13, 13 + lm.u_dim),
    )
    return (
        new_traj,
        ocost[0],
        oiter[0].astype(jnp.int32),
        ostat[0].astype(jnp.int32),
    )
