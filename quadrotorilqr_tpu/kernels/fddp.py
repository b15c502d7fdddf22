"""Whole-solve fused Pallas kernel for the FDDP robust solver.

`solver/fddp.solve_fddp` (multiple-shooting gaps + Goldstein acceptance +
adaptive Levenberg mu — the configuration that rescues the aggressive
scenarios where the exact reference loop diverges, see solver/fddp.py's
module docstring) runs per scenario on the XLA path. This kernel runs the
COMPLETE FDDP loop for a 128-scenario lane tile in ONE Pallas program —
robust solving at the same kernel speed as the exact-loop whole-solve
engine (kernels/solve.py).

Per-lane semantics are the FLATTENED form of solve_fddp's nested loops
(outer accepted-update loop x inner adaptive-mu retry loop): each kernel
trip runs defects -> gap-transported backward pass (at this lane's current
mu) -> exact quadratic line-search model -> Goldstein backtracking with
gap-contracting rollouts -> per-lane accept/reject + mu schedule. A
rejected trip leaves the lane's trajectory unchanged and raises its mu, so
the next trip IS the XLA version's retry (its recomputed defects and
derivatives are bit-identical); both formulations count every
backward+line-search execution against `max_iters`. Lane-for-lane f64
interpret parity with vmap(solve_fddp) is the contract
(tests/test_fddp_fused.py).

Per-trip structure (all scratch in VMEM, loop bounds static — Mosaic
cannot lower vector-carry while_loops, same mapping as kernels/solve.py).
Round 3 fused the round-2 kernel's five sweeps per trip into at most
backward + line-search probes (the robust-mode efficiency item,
VERDICT r2 #1) — per-lane VALUES are unchanged, only sweep structure:

  * fused merge + defects + backward (ONE reverse sweep): the previous
    trip's accepted candidates merge lazily (persisted _TAKE row), then
    the stage defect d_n = f(x_n, u_n) (-) x_{n+1} — stage-independent,
    so it rides the reverse sweep (stage n+1 merges before stage n's
    defect reads it) — then the SHARED Riccati stage
    (backward._riccati_stage) with the FDDP value transport
    v_x_eff = v_x + V_xx d_n and the per-lane quu_reg + mu row. On a
    RETRY trip (no lane accepted) merge+defects are SKIPPED per tile:
    the trajectory is unchanged, so d_ref and the cached _GAP row are
    still exact — the round-2 kernel provably recomputed identical
    values;
  * line search: per-lane Goldstein backtracking with GAP-CONTRACTING
    rollouts (x' = f(x, u) (+) (-(1-alpha) d)); probe 0 (all active
    lanes pend) additionally carries the exact quadratic model
    p' = J_x p + J_u w + d, dJ(alpha) = alpha L1 + alpha^2 L2
    (solver/fddp._backward_from_derivs's fwd scan) through the SAME
    forward sweep, persisting L1/L2 in state rows — the round-2 kernel
    paid a separate full sweep for it. No trip-0 forced step (that is
    an exact-loop special, ilqr.hh:71-73). Round 4 (VERDICT r3 #1):
    probes after the first accumulate cost with per-stage SATURATION at
    a cap strictly above the Goldstein threshold
    (solver/fddp._probe_cap) — a saturated candidate is deterministic
    (== cap) on every engine, which buys (a) tile EARLY-OUT of probe
    rollouts once every pending lane has saturated (per-stage pl.when
    predication, remaining stages skip) and (b) ESCALATED backtracking
    (solver/fddp._next_alpha): an exploded probe jumps ~0.1 alpha in
    one step instead of walking down geometrically. Fractional
    executed-sweep counts ride the _PROBES row for the roofline;
  * close: accepted lanes commit the candidate COST and run the
    Crocoddyl-style mu warm schedule keyed on the accepted step length
    (decay at alpha >= alpha_dec, RAISE at alpha <= alpha_inc — the
    trajectory merge is deferred to the next trip's fused sweep, or the
    final merge after the trip loop); rejected lanes keep everything and
    raise mu (terminal LINE_SEARCH_FAILED at reg_max); CONVERGED requires
    an accepted step whose PRE-update gap is already below gap_tol plus
    the cost criterion (ilqr.hh:196-205) — a converged lane is always
    dynamically feasible.

Substepped models (kernels/models.substepped_lane_model) run natively
(VERDICT r3 #2): defects and rollouts use the chained k-substep stage
map, the Riccati stage chains per-substep jacobian blocks
(backward._riccati_stage substeps/chain), and the quadratic-model
recursion accumulates the chained J_u. Since round 5 ddp=True composes
with substeps too: the exact curvature of the CHAINED stage map —
including the f_uu/f_xu terms the chain introduces — in closed form
(backward._riccati_stage's second-order chain rule; the last engine
refusal, VERDICT r4 #5).

`limits=(lo, hi)` swaps the stage gain solve for the projected-Newton
box-QP and clamps every rollout control (solve_fddp(limits=...)
semantics — robust solving under rotor saturation at kernel speed).
`ddp=True` runs the full-DDP exact curvature inside the kernel via the
ANALYTIC closed forms (backward._vfxx_lanes / _cxx_corr_lanes — the lane
mirror of solver/ddp.py's nested-jacfwd tensors; both exact, so f64
parity holds) — the best-measured solver configuration on every scenario
family (benchmarks/solvers_bench.py) at kernel speed. Horizons beyond the
VMEM budget route to the streamed variant (kernels/stream_fddp.py).
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
from .rollout import _state_minus
from .solve import MAX_HORIZON, SUPER_SUB, SUPER_TILE, _from_super, _to_super
from ..solver.fddp import (
    _next_alpha,
    _probe_cap,
    _saturating_stage_cost_add,
)

# rows of the per-lane solver-state scratch tile (kernels/solve.py layout
# plus the per-lane adaptive Levenberg mu, the deferred-merge mask, the
# cached feasibility gap, and the per-trip quadratic-model coefficients)
(
    _COST, _DONE, _STATUS, _ITERS, _ALPHA, _ACCEPTED, _BESTC, _MU,
    _TAKE, _GAP, _L1, _L2, _PROBES,
) = range(13)
_STATE_ROWS = 16  # two f32 sublane tiles (13 live rows + pad)


def max_horizon_for_fddp(u_dim):
    """VMEM horizon bound: the exact-loop kernel's per-stage rows
    (kernels/solve.max_horizon_for) plus the 12-row defect scratch."""
    return (MAX_HORIZON * 112) // (60 + 16 * u_dim)


# ---------------------------------------------------------------------------
# FDDP trip / line-search state machine, shared with the STREAMED FDDP
# kernel (kernels/stream_fddp.py) — same convention as the exact-loop pair
# (kernels/solve._ls_probe_commit/_trip_close): the bookkeeping has ONE
# definition so any semantic change lands in both kernels by construction.
# `get`/`put` are the per-lane solver-state row accessors.
# ---------------------------------------------------------------------------


def _goldstein_probe_commit(
    get, put, gf, gub, ls_step, active, current, l1, l2,
    cand_cost, pending, accepted, alpha,
):
    """Accept/backtrack bookkeeping for one Goldstein probe
    (solver/fddp.line_search: the band tolerates the legitimate cost
    INCREASE of closing gaps). Returns the still-pending mask for the
    caller's SMEM probe counter."""
    dj = alpha * l1 + alpha * alpha * l2
    actual = cand_cost - current
    # select between the FLOAT thresholds, not between bool results: a
    # bool-valued select needs a vector i8->i1 truncation Mosaic cannot
    # lower ("Unsupported target bitwidth for truncation" on real TPU; the
    # interpret-mode parity tests structurally cannot see this). Per-lane
    # bit-identical to where(dj<=0, actual<=gf*dj, actual<=gub*dj).
    ok = actual <= jnp.where(dj <= 0, gf, gub) * dj
    # |x| < inf == isfinite (NaN compares false) — plain compare ops only,
    # guaranteed to lower in Mosaic
    ok = jnp.logical_and(ok, jnp.abs(cand_cost) < jnp.inf)
    put(_BESTC, jnp.where(pending, cand_cost, get(_BESTC)))
    accepted2 = jnp.logical_or(accepted, jnp.logical_and(pending, ok))
    put(_ACCEPTED, accepted2.astype(cand_cost.dtype))
    # escalated backtracking — the SAME elementwise formula (one
    # definition, solver/fddp._next_alpha) the XLA line search applies, so
    # the per-lane alpha sequences stay bit-identical: geometric step on an
    # ordinary rejection, a multi-step jump when the probe exploded
    # (cand_cost saturated at the probe cap)
    cap = _probe_cap(current + jnp.where(dj <= 0, gf, gub) * dj, current)
    put(
        _ALPHA,
        jnp.where(
            jnp.logical_or(accepted2, jnp.logical_not(active)),
            alpha,
            _next_alpha(alpha, cand_cost, cap, ls_step),
        ),
    )
    return jnp.logical_and(active, jnp.logical_not(accepted2))


def _fddp_trip_close(
    get, put, conv, dtype, active, done, current, mu, gap,
    gap_tol, reg_init, reg_up, reg_down, reg_min, reg_max,
    a_dec, a_inc,
):
    """Post-line-search cost commit, per-lane Levenberg schedule
    (solver/fddp.py retry_body), and convergence/status/iteration
    bookkeeping. The accepted-candidate merge may happen BEFORE this close
    (the streamed kernel's apply sweep) or be DEFERRED to the next trip's
    fused backward sweep via the persisted _TAKE row (the VMEM kernel).
    Returns (still-open lane count, accepted lane count) for the caller's
    all-done / defects-stale SMEM flags."""
    accepted = get(_ACCEPTED) > 0.5
    take = jnp.logical_and(active, accepted)
    put(_TAKE, take.astype(dtype))
    best_cost = get(_BESTC)
    put(_COST, jnp.where(take, best_cost, current))

    headroom = mu < reg_max
    terminal = jnp.logical_and(
        active,
        jnp.logical_and(
            jnp.logical_not(accepted), jnp.logical_not(headroom)
        ),
    )
    mu_dec = mu * reg_down
    mu_dec = jnp.where(mu_dec < reg_min, 0.0, mu_dec)
    mu_inc = jnp.where(
        mu == 0.0, reg_init, jnp.minimum(mu * reg_up, reg_max)
    )
    # Crocoddyl warm schedule keyed on the accepted step length (the
    # _ALPHA row froze at the accepted alpha): decay only on confident
    # steps, RAISE on crawling ones — mirrors solver/fddp.retry_body
    alpha_acc = get(_ALPHA)
    mu_accept = jnp.where(
        alpha_acc >= a_dec,
        mu_dec,
        jnp.where(alpha_acc <= a_inc, mu_inc, mu),
    )
    mu_next = jnp.where(
        accepted, mu_accept, jnp.where(headroom, mu_inc, mu)
    )
    put(_MU, jnp.where(active, mu_next, mu))

    # CONVERGED requires an accepted step from an already-feasible iterate
    # (pre-update gap) plus the cost criterion
    feasible = gap < gap_tol
    post_conv = jnp.logical_and(
        jnp.logical_and(take, feasible), conv(current, best_cost)
    )
    status = get(_STATUS)
    status = jnp.where(
        terminal,
        jnp.asarray(2.0, dtype),  # STATUS_LINE_SEARCH_FAILED
        jnp.where(post_conv, jnp.asarray(1.0, dtype), status),
    )
    put(_STATUS, status)
    done2 = jnp.logical_or(done, jnp.logical_or(post_conv, terminal))
    put(_DONE, done2.astype(dtype))
    put(_ITERS, get(_ITERS) + active.astype(dtype))
    return (
        jnp.sum(jnp.logical_not(done2).astype(dtype)),
        jnp.sum(take.astype(dtype)),
    )


def _fddp_kernel(
    n_stages,
    max_iters,
    ls_max_iters,
    lane_model,  # model family descriptor (kernels/models.py)
    use_weights,  # static: per-stage cost weights active (w_ref read)
    use_box,  # static: control limits active (lo/hi refs read)
    ddp,  # static: exact-DDP curvature in the Riccati stage + quad model
    fscal_ref,  # SMEM (8,): [dt, quu_reg floor, rtol, atol, ls_step, 0, 0, 0]
    gscal_ref,  # SMEM (12,): [goldstein_frac, goldstein_ub, gap_tol,
    #             reg_init, reg_scale_up, reg_scale_down, reg_min, reg_max,
    #             alpha_dec, alpha_inc, 0, 0]
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
    imu_ref,  # (1, Bt) initial per-lane Levenberg mu (zeros = fresh solve)
    istat_ref,  # (1, Bt) initial STATUS_* codes (nonzero lanes are FROZEN)
    iiter_ref,  # (1, Bt) initial iteration counts (resume continues them)
    oq_ref,  # out (N, 4, Bt): final trajectory (doubles as the live one)
    ot_ref,
    ov_ref,
    ou_ref,
    ocost_ref,  # out (1, Bt)
    oiter_ref,  # out (1, Bt) f32 (cast to int32 by the wrapper)
    ostat_ref,  # out (1, Bt) f32 STATUS_* codes
    omu_ref,  # out (1, Bt): final per-lane mu (feeds a later resume)
    oprob_ref,  # out (1, Bt): executed probe sweeps (tile-uniform; the
    #             roofline work model's rollouts-per-trip measurement)
    ks_ref,  # scratch (N, u, Bt)
    bigks_ref,  # scratch (N, u, 12, Bt)
    bq_ref,  # scratch (N, 4, Bt): best line-search candidate
    bt_ref,  # scratch (N, 3, Bt)
    bv_ref,  # scratch (N, 6, Bt)
    bu_ref,  # scratch (N, u, Bt)
    d_ref,  # scratch (N, 12, Bt): multiple-shooting defects
    st_ref,  # scratch (_STATE_ROWS, Bt): per-lane solver state rows
    cr_ref,  # scratch (16, Bt): rollout carry across early-out chunks
    #          (rows 0:4 quat, 4:7 trans, 7:13 vel, 13:14 running cost)
    flag_ref,  # scratch SMEM (4,): [all_done, ls_pending_count,
    #            defects_stale (some lane accepted last trip / trip 0),
    #            probe-rollout viable (any pending lane not yet saturated)]
):
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
    g2 = g_ref[:]  # (1, 1, bt) for the backward/jacobian blocks
    g1 = g_ref[0]  # (1, bt) for the rollout dynamics
    m_inv = minv_ref[0]
    ju = ju_ref[:]
    ju_t = L.transpose(ju)
    extra = extra_ref[:]
    drag = lane_model.drag_rows(extra)
    i_l = i_ref[:]
    iinv_l = iinv_ref[:]
    box = (lo_ref[:], hi_ref[:]) if use_box else None
    # trailing batch shape: (Bt,) lane layout / (8, 128) supertile — the
    # body below is layout-agnostic exactly like kernels/solve.py's
    bshape = q_l.shape[2:]
    dtype = q_l.dtype
    lo = lane_model.ju_lo
    zeros1 = jnp.zeros((1,) + bshape, dtype)
    ez = jnp.concatenate(
        [jnp.zeros((2,) + bshape, dtype), jnp.ones((1,) + bshape, dtype)],
        axis=0,
    )
    # substepped integration (kernels/models.substepped_lane_model): the
    # Riccati stage and the quadratic-model recursion chain per-substep
    # jacobian blocks; the chain rolls intermediate substates with the BASE
    # single-step dynamics (same mapping as kernels/solve.py)
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
        # keep the exact summation order of kernels/solve.py (f32 cost
        # accumulation is association-sensitive, tests/test_accuracy_f32.py)
        dxd = _state_minus(quat, trans, vel, dq_ref[n], dtr_ref[n], dv_ref[n])
        duv = u - du_ref[n]
        c = L.dot_lanes(dxd, L.matvec(q_l, dxd)) + L.dot_lanes(
            duv, L.matvec(r_l, duv)
        )
        return w_ref[n] * c if use_weights else c

    # --- init: live trajectory lives in the output refs; resume state
    # (mu / status / iters — zeros for a fresh solve) seeds the lane rows.
    # Resuming needs NO other state: the committed cost is bit-equal to the
    # stage-sum of the (merged) output trajectory, defects/gap recompute on
    # the first trip (stale flag), and _TAKE starts clear because a phase
    # boundary always follows the final merge. ---
    oq_ref[:] = q_ref[:]
    ot_ref[:] = t_ref[:]
    ov_ref[:] = v_ref[:]
    ou_ref[:] = u_ref[:]
    st_ref[:] = jnp.zeros((_STATE_ROWS,) + bshape, dtype)
    put(_MU, imu_ref[:])
    put(_STATUS, istat_ref[:])
    put(_ITERS, iiter_ref[:])
    put(_DONE, (istat_ref[:] != 0.0).astype(dtype))

    # FDDP always seeds from the true (possibly infeasible) trajectory cost
    # (solver/fddp.py cost0) — there is no trip-0 forced step to hide it.
    def cseed(n, c):
        return c + stage_cost(oq_ref[n], ot_ref[n], ov_ref[n], ou_ref[n], n)

    put(_COST, jax.lax.fori_loop(0, n_stages, cseed, zeros1))

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
            # the PREVIOUS trip's accepted lanes: their candidates are
            # merged lazily inside the backward sweep below (one fused
            # sweep instead of a separate merge pass + defect pass)
            take = get(_TAKE) > 0.5

            @pl.when(flag_ref[2] > 0.5)
            def _():
                put(_GAP, zeros1)

            # ---- fused merge + defects + gap-transported backward pass.
            # The defect d_n = f(x_n, u_n) (-) x_{n+1} is stage-independent
            # (solver/fddp.defects is a map, not a recursion), so it rides
            # the REVERSE Riccati sweep: stage n+1 is merged before stage
            # n's defect reads it. A trip with no prior accepts (mu retry)
            # skips merge+defects entirely — the trajectory is unchanged,
            # so d_ref and the cached _GAP row are still exact
            # (the round-2 kernel recomputed both every trip). ----
            def bstage(idx, carry):
                n = n_stages - 1 - idx
                v_x, v_xx = carry

                @pl.when(flag_ref[2] > 0.5)
                def _():
                    oq_ref[n] = jnp.where(take, bq_ref[n], oq_ref[n])
                    ot_ref[n] = jnp.where(take, bt_ref[n], ot_ref[n])
                    ov_ref[n] = jnp.where(take, bv_ref[n], ov_ref[n])
                    ou_ref[n] = jnp.where(take, bu_ref[n], ou_ref[n])

                    @pl.when(n < n_stages - 1)
                    def _():
                        qn, tn, vn = lane_model.dynamics_step(
                            dt, g1, m_inv, extra, i_l, iinv_l, ez,
                            oq_ref[n], ot_ref[n], ov_ref[n], ou_ref[n],
                        )
                        dk = _state_minus(
                            qn, tn, vn,
                            oq_ref[n + 1], ot_ref[n + 1], ov_ref[n + 1],
                        )
                        d_ref[n] = dk
                        put(
                            _GAP,
                            jnp.maximum(
                                get(_GAP),
                                jnp.max(jnp.abs(dk), axis=0, keepdims=True),
                            ),
                        )

                    @pl.when(n == n_stages - 1)
                    def _():
                        d_ref[n] = jnp.zeros((12,) + bshape, dtype)

                # first-order value transport across the gap (FDDP): only
                # the linear terms q_x/q_u see the transported gradient
                v_x_eff = v_x + L.matvec(v_xx, d_ref[n])
                k, big_k, v_x2, v_xx2, _, _ = _riccati_stage(
                    dt, quu_reg, q_l, r2_l, g2, ju, ju_t, i_l, iinv_l,
                    oq_ref[n], ot_ref[n], ov_ref[n], ou_ref[n],
                    dq_ref[n], dtr_ref[n], dv_ref[n], du_ref[n],
                    v_x_eff, v_xx,
                    ju_lo_row=lo,
                    box=box,
                    w=w_ref[n] if use_weights else None,
                    ddp=ddp,
                    drag=drag,
                    substeps=lane_model.substeps,
                    chain=chain,
                )
                ks_ref[n] = k
                bigks_ref[n] = big_k
                return (v_x2, v_xx2)

            binit = (
                jnp.zeros((12,) + bshape, dtype),
                jnp.zeros((12, 12) + bshape, dtype),
            )
            jax.lax.fori_loop(0, n_stages, bstage, binit)
            gap = get(_GAP)

            # ---- Goldstein line search with gap-contracting rollouts.
            # Probe 0 (every active lane pends) additionally carries the
            # exact quadratic model p' = J_x p + J_u w + d,
            # dJ(alpha) = alpha L1 + alpha^2 L2 (fddp fwd scan) through the
            # SAME forward sweep — the round-2 kernel paid a separate pass
            # for it; its L1/L2 persist in state rows for later probes. ----
            put(_ALPHA, jnp.ones((1,) + bshape, dtype))
            put(_ACCEPTED, jnp.zeros((1,) + bshape, dtype))
            put(_BESTC, current)
            flag_ref[1] = jnp.sum(active.astype(dtype))

            def rollout_stage(n, quat, trans, vel, c, alpha, pending, sat=None):
                """One gap-contracting rollout stage (fddp.rollout_gap) +
                candidate write; returns the next state and running cost.
                `sat=(gdj, current, cap)` (probes after the first) runs the
                frozen-saturating accumulation —
                solver/fddp._saturating_stage_cost_add, the shared op order
                the XLA line search folds with."""
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
                cs = stage_cost(quat, trans, vel, u, n)
                c = (
                    c + cs
                    if sat is None
                    else _saturating_stage_cost_add(c, cs, *sat)
                )
                bq_ref[n] = jnp.where(pending, quat, bq_ref[n])
                bt_ref[n] = jnp.where(pending, trans, bt_ref[n])
                bv_ref[n] = jnp.where(pending, vel, bv_ref[n])
                bu_ref[n] = jnp.where(pending, u, bu_ref[n])
                qn, tn, vn = lane_model.dynamics_step(
                    dt, g1, m_inv, extra, i_l, iinv_l, ez,
                    quat, trans, vel, u,
                )
                # a step of length alpha closes an alpha-fraction of the gap
                tau = -(1.0 - alpha) * d_ref[n]
                qe, te = L.se3_exp(tau[0:6])
                qn, tn = L.se3_multiply(qn, tn, qe, te)
                vn = vn + tau[6:12]
                return qn, tn, vn, c

            def rstage0(n, carry):
                quat, trans, vel, c, p, l1, l2 = carry
                # quadratic model from the LIVE trajectory (not the carry);
                # substepped stage maps chain per-substep blocks exactly as
                # the Riccati stage does (j_x = A_k...A_1, never formed)
                if lane_model.substeps > 1:
                    h = dt / lane_model.substeps
                    blocks_list = []
                    sq, st_, sv = oq_ref[n], ot_ref[n], ov_ref[n]
                    for si in range(lane_model.substeps):
                        blocks_list.append(
                            _stage_jx_blocks(h, g2, sv, sq, i_l, iinv_l, drag)
                        )
                        if si < lane_model.substeps - 1:
                            sq, st_, sv = lane_model.base.dynamics_step(
                                h, g1, m_inv, extra, i_l, iinv_l, ez,
                                sq, st_, sv, ou_ref[n],
                            )
                else:
                    blocks_list = [
                        _stage_jx_blocks(
                            dt, g2, ov_ref[n], oq_ref[n], i_l, iinv_l, drag
                        )
                    ]
                # with ddp, L2 quadratizes through the EXACT c_xx — same
                # as the XLA fwd scan consuming the ddp derivative bundle
                _, c_x, c_xx, du = _stage_cost_diffs(
                    oq_ref[n], ot_ref[n], ov_ref[n], ou_ref[n],
                    dq_ref[n], dtr_ref[n], dv_ref[n], du_ref[n], q_l,
                    exact=ddp,
                )
                r2w = r2_l
                if use_weights:
                    c_x = w_ref[n] * c_x
                    c_xx = w_ref[n] * c_xx
                    r2w = w_ref[n] * r2_l
                c_u = L.matvec(r2w, du)
                wv = ks_ref[n] + L.matvec(bigks_ref[n], p)
                l1 = l1 + L.dot_lanes(c_x, p) + L.dot_lanes(c_u, wv)
                l2 = l2 + 0.5 * (
                    L.dot_lanes(p, L.matvec(c_xx, p))
                    + L.dot_lanes(wv, L.matvec(r2w, wv))
                )
                if lane_model.substeps > 1:
                    # p' = (A_k...A_1) p + (sum_i A_k...A_{i+1} B) w:
                    # jw_1 = B w, jw_i = A_i jw_{i-1} + B w — the vector
                    # mirror of the Riccati JU accumulation
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
                        [p2[0:lo], p2[lo:12] + L.matvec(ju[lo:12], wv)],
                        axis=0,
                    )
                quat, trans, vel, c = rollout_stage(
                    n, quat, trans, vel, c, get(_ALPHA), active
                )
                return (quat, trans, vel, c, p2 + d_ref[n], l1, l2)

            rinit0 = (
                oq_ref[0], ot_ref[0], ov_ref[0], zeros1,
                jnp.zeros((12,) + bshape, dtype), zeros1, zeros1,
            )
            _, _, _, cand_cost, _, l1, l2 = jax.lax.fori_loop(
                0, n_stages, rstage0, rinit0
            )
            put(_PROBES, get(_PROBES) + 1.0)
            put(_L1, l1)
            put(_L2, l2)
            still_pending = _goldstein_probe_commit(
                get, put, gf, gub, ls_step, active, current, l1, l2,
                cand_cost, active, jnp.zeros((1,) + bshape, bool),
                get(_ALPHA),
            )
            flag_ref[1] = jnp.sum(still_pending.astype(dtype))

            def ls_trip(j, tok2):
                @pl.when(flag_ref[1] > 0.5)
                def _():
                    accepted = get(_ACCEPTED) > 0.5
                    pending = jnp.logical_and(active, jnp.logical_not(accepted))
                    alpha = get(_ALPHA)
                    l1v = get(_L1)
                    l2v = get(_L2)
                    # ---- probe rollout with per-stage tile early-out: the
                    # frozen-saturating fold (_saturating_stage_cost_add)
                    # freezes a lane's accumulation at its first Goldstein
                    # crossing (reject guaranteed by the accept test's own
                    # arithmetic) and saturates explosions at cap, so once
                    # EVERY pending lane is frozen the remaining stages
                    # cannot change any committed value (the XLA path's
                    # full fold ends at the same frozen values) and the
                    # rest of the sweep is a predicated skip — EVERY
                    # rejected probe stops early, not just exploding ones.
                    # The carry rides cr_ref rows (the kernels/solve.py
                    # pattern: bounded fori_loop + pl.when + flag rows — an
                    # unrolled-chunk variant was tried and compiled ~10x
                    # slower for the same semantics). ----
                    dj = alpha * l1v + alpha * alpha * l2v
                    gdj = jnp.where(dj <= 0.0, gf, gub) * dj
                    cap = _probe_cap(current + gdj, current)
                    sat = (gdj, current, cap)

                    cr_ref[0:4] = oq_ref[0]
                    cr_ref[4:7] = ot_ref[0]
                    cr_ref[7:13] = ov_ref[0]
                    cr_ref[13:14] = zeros1
                    flag_ref[3] = jnp.ones((), dtype)

                    def rstage(n, tok3):
                        @pl.when(flag_ref[3] > 0.5)
                        def _():
                            quat, trans, vel, c = rollout_stage(
                                n, cr_ref[0:4], cr_ref[4:7], cr_ref[7:13],
                                cr_ref[13:14], alpha, pending, sat=sat,
                            )
                            cr_ref[0:4] = quat
                            cr_ref[4:7] = trans
                            cr_ref[7:13] = vel
                            cr_ref[13:14] = c
                            # viability check + fractional probe accounting
                            # every 8th stage (and at the sweep end): the
                            # lane reduction + SMEM flag write cost real
                            # per-stage time when run every stage (measured
                            # ~5% off the GN throughput), and the flag only
                            # ever flips False — checking at 8-stage
                            # granularity keeps the early-out and amortizes
                            # the bookkeeping 8x. The increment covers the
                            # stages since the last check boundary, so the
                            # _PROBES row still counts EXECUTED
                            # sweep-equivalents (the roofline contract).
                            at_check = jnp.logical_or(
                                n % 8 == 7, n == n_stages - 1
                            )

                            @pl.when(at_check)
                            def _():
                                put(
                                    _PROBES,
                                    get(_PROBES)
                                    + (n % 8 + 1).astype(dtype) / n_stages,
                                )
                                # viable = not frozen: the fold's own
                                # freeze arithmetic, so stopping is exact
                                viable = jnp.logical_and(
                                    pending,
                                    jnp.logical_not((c - current) > gdj),
                                )
                                flag_ref[3] = jnp.sum(viable.astype(dtype))

                        return tok3

                    jax.lax.fori_loop(0, n_stages, rstage, 0)
                    cand_cost = cr_ref[13:14]
                    still = _goldstein_probe_commit(
                        get, put, gf, gub, ls_step, active, current,
                        l1v, l2v, cand_cost, pending, accepted,
                        alpha,
                    )
                    flag_ref[1] = jnp.sum(still.astype(dtype))

                return tok2

            jax.lax.fori_loop(1, ls_max_iters, ls_trip, 0)

            # ---- close: the accepted-candidate merge is DEFERRED to the
            # next trip's fused backward sweep (or the final merge below);
            # a rejected trip keeps the trajectory and the next trip is the
            # adaptive-mu retry, skipping merge+defects ----
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

    # the LAST trip's accepted candidates were never merged by a following
    # sweep — apply them once
    take = get(_TAKE) > 0.5

    def mstage(n, tok3):
        oq_ref[n] = jnp.where(take, bq_ref[n], oq_ref[n])
        ot_ref[n] = jnp.where(take, bt_ref[n], ot_ref[n])
        ov_ref[n] = jnp.where(take, bv_ref[n], ov_ref[n])
        ou_ref[n] = jnp.where(take, bu_ref[n], ou_ref[n])
        return tok3

    jax.lax.fori_loop(0, n_stages, mstage, 0)

    ocost_ref[:] = get(_COST)
    oiter_ref[:] = get(_ITERS)
    ostat_ref[:] = get(_STATUS)
    omu_ref[:] = get(_MU)
    oprob_ref[:] = get(_PROBES)


@functools.partial(
    jax.jit,
    static_argnames=(
        "n",
        "batch",
        "max_iters",
        "ls_max_iters",
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
def _fddp_call(
    fscal,
    gscal,
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
    imu,
    istat,
    iiter,
    n,
    batch,
    max_iters,
    ls_max_iters,
    lane_model,
    use_weights,
    use_box,
    ddp,
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
        # supertile layout (kernels/solve.py): (..., B) per-lane operands
        # -> (..., 8, S*128); (..., TILE) broadcast tiles materialize
        # across the 8 sublanes
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
            inertia_inv, lo, hi, imu, istat, iiter,
        ) = map(
            prep,
            (
                states_q, states_t, states_v, controls, des_q, des_t,
                des_v, des_u, q_mat, r_mat, w, g, m_inv, ju, extra,
                inertia, inertia_inv, lo, hi, imu, istat, iiter,
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
    kernel = functools.partial(
        _fddp_kernel, n, max_iters, ls_max_iters, lane_model, use_weights,
        use_box, ddp,
    )
    oq, ot, ov, ou, ocost, oiter, ostat, omu, oprob = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
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
            lane_block((1,)),
            lane_block((1,)),
            lane_block((1,)),
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
            lane_block((1,)),
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
            jax.ShapeDtypeStruct((1,) + obatch, dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((n, u) + btile, dtype),
            pltpu.VMEM((n, u, 12) + btile, dtype),
            pltpu.VMEM((n, 4) + btile, dtype),
            pltpu.VMEM((n, 3) + btile, dtype),
            pltpu.VMEM((n, 6) + btile, dtype),
            pltpu.VMEM((n, u) + btile, dtype),
            pltpu.VMEM((n, 12) + btile, dtype),
            pltpu.VMEM((_STATE_ROWS,) + btile, dtype),
            pltpu.VMEM((16,) + btile, dtype),
            pltpu.SMEM((4,), dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            # see kernels/solve.py: supertile grid steps may legitimately
            # use up to ~120 MiB of the v5e's 128 MiB VMEM
            vmem_limit_bytes=(120 if supertile else 100) * 1024 * 1024
        ),
        interpret=interpret,
    )(
        fscal,
        gscal,
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
        imu,
        istat,
        iiter,
    )
    outs = (oq, ot, ov, ou, ocost, oiter, ostat, omu, oprob)
    if supertile:
        return tuple(_from_super(a, batch) for a in outs)
    return outs


def solve_fddp_fused(
    params,
    cost,
    traj,
    dt_s,
    options,
    fddp_options=None,
    interpret=False,
    model=None,
    limits=None,
    ddp=False,
    initial_mu=None,
    initial_status=None,
    initial_iters=None,
    return_mu=False,
    return_probes=False,
    supertile=False,
):
    """Whole-solve single-kernel FDDP for (B, N, ...) trajectories, B a
    multiple of 128. Same inputs as solver/fddp.solve_fddp. `ddp=True`
    runs the full-DDP exact curvature inside the kernel (ANALYTIC
    closed-form — solver/ddp.vfxx_analytic / cxx_curvature_correction in
    lane layout — where the XLA path uses nested jacfwd tensors; both are
    exact, so lane-for-lane f64 parity holds, tests/test_fddp_fused.py).
    `limits=(lo, hi)` runs the box-QP stage + clamped gap rollouts
    (solve_fddp(limits=...) semantics). Returns the batch-engine tuple
    layout: (Trajectory, cost (B,), iterations (B,) i32, status (B,) i32).

    `initial_mu` / `initial_status` / `initial_iters` ((B,) arrays) resume
    an interrupted solve exactly: lanes whose initial status != 0 are
    FROZEN (all-frozen tiles skip every trip), pending lanes continue their
    Levenberg schedule and iteration count against this call's max_iters
    budget. `return_mu=True` appends the final per-lane mu to the tuple —
    the compacted two-phase driver (solver/batched.solve_batch_fddp_refine)
    threads it between phases.

    `supertile=True` runs the dense-register (r, c, 8, 128) layout
    (kernels/solve.py SUPER_TILE: 1024 scenarios per grid step, 8 riding
    the sublane dim) — the kernel BODY is unchanged (trailing-shape
    agnostic), so lane parity certifies a layout transform
    (tests/test_fddp_supertile.py). Needs batch % 1024 == 0; VMEM per
    grid step is 8x the lane tile's, so the horizon budget shrinks
    (solver/batched.solve_batch_fddp guards and demotes)."""
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
            f"supertile=True needs batch a multiple of {SUPER_TILE} "
            f"(8 sublane scenarios x 128 lanes per grid step), got {batch}"
        )
    if n > max_horizon_for_fddp(lm.u_dim):
        raise ValueError(
            f"horizon {n} exceeds the FDDP kernel's VMEM budget "
            f"({max_horizon_for_fddp(lm.u_dim)} stages at u={lm.u_dim}); "
            "use the XLA path (vmap(solver.fddp.solve_fddp))"
        )
    dtype = controls.dtype
    ls = options.line_search_params
    if int(ls.max_iters) < 1:
        raise ValueError(
            "line_search_params.max_iters must be >= 1 on the FDDP kernel"
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

    def lane_row(a):
        if a is None:
            return jnp.zeros((1, batch), dtype)
        return jnp.asarray(a, dtype).reshape(1, batch)

    oq, ot, ov, ou, ocost, oiter, ostat, omu, oprob = _fddp_call(
        fscal,
        gscal,
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
        lane_row(initial_mu),
        lane_row(initial_status),
        lane_row(initial_iters),
        n,
        batch,
        int(cc.max_iters),
        int(ls.max_iters),
        lm,
        use_weights,
        use_box,
        ddp,
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
    if return_mu:
        out = out + (omu[0],)
    if return_probes:
        out = out + (oprob[0],)
    return out
