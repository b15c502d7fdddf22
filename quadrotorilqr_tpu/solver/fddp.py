"""Infeasible-start iLQR (FDDP-style multiple shooting) with adaptive
Levenberg regularization — the robust solver for problems where the exact
reference loop dies.

THE FAILURE CLASS. The reference semantics (ilqr.hh:58-84, reproduced by
`solver.ilqr.solve`) makes an infeasible initial trajectory feasible with
one unconditional full closed-loop rollout on iteration 0. For aggressive
scenarios (large attitude error, fast tumble, coarse dt) that single shot
DIVERGES: the gyroscopic term omega x (I omega) grows like omega^2 under
Euler integration, the rollout overflows to NaN, the NaN cost is accepted
unconditionally, and every later line search fails
(STATUS_LINE_SEARCH_FAILED — where the reference throws, ilqr.hh:191-193).
Measured on random aggressive hover scenarios this kills ~40% of seeds
(tests/test_fddp.py). Quu regularization alone CANNOT rescue it: with the
initial controls equal to the desired controls every feedforward gain is
exactly zero (zero residuals downstream), so there is no gradient signal
until a full rollout succeeds — the method needs a different rollout, not a
different backward pass.

THE FIX (cf. Mastalli et al., "Crocoddyl: An Efficient and Versatile
Framework for Multi-Contact Optimal Control", ICRA 2020 — the FDDP
algorithm, re-derived here for the Lie-group state, no code shared):
treat the trajectory as MULTIPLE SHOOTING nodes with defects ("gaps")

    d_k = f(x_k, u_k) (-) x_{k+1}        (12-tangent at x_{k+1})

and close the gaps progressively instead of all at once:

  * backward pass: the next-stage value gradient is transported across the
    gap, v_x_eff = v_x + V_xx d_k, before forming Q_x/Q_u (first-order
    value transport); gains actively steer INTO the gap closure;
  * rollout: x_{k+1} = f(x_k, u_k) (+) (-(1-alpha) d_k) — a step of length
    alpha closes exactly an alpha-fraction of every gap, so small steps
    keep the iterate near the (finite) shooting nodes and the rollout can
    never run away;
  * acceptance: the expected change of the quadratized problem is computed
    EXACTLY by one extra forward scan — with dx_k = alpha p_k, du_k =
    alpha w_k, where p_{k+1} = J_x p_k + J_u w_k + d_k, w_k = k_k + K_k p_k:

        dJ(alpha) = alpha * L1 + alpha^2 * L2,
        L1 = sum c_x.p + c_u.w,   L2 = sum (p.C_xx.p + w.C_uu.w) / 2

    (for zero gaps this reduces to the classic alpha*Qu'k +
    alpha^2/2*k'Quu k; with gaps it correctly predicts the unavoidable
    cost INCREASE of closing them from a fake-infeasible iterate, which a
    naive Armijo test would reject forever). Acceptance is the Goldstein
    band: actual <= goldstein_frac * dJ when dJ <= 0, actual <=
    goldstein_ub * dJ when dJ > 0;
  * adaptive Levenberg mu on Quu: raised on rejection, decayed on
    acceptance (snapped to exactly 0 below reg_min), per-lane under vmap.

With a FEASIBLE initial trajectory all gaps are zero and every piece above
degenerates to the standard iLQR iteration (same stationary points as
`solve`; the line-search rule differs, so iterates may differ — tested).
Convergence requires BOTH the cost criterion (ilqr.hh:196-205) and
max|d| < gap_tol, so a converged result is always dynamically feasible.

Everything is compiled control flow (while_loops), composes with vmap over
scenarios, and is model-generic.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from ..costs import quadratic as qc
from ..models import quadrotor as qm
from .ilqr import (
    STATUS_CONVERGED,
    STATUS_LINE_SEARCH_FAILED,
    STATUS_MAX_ITERS,
    SolveResult,
    Trajectory,
    is_converged,
    quadratize,
    riccati_gains_update,
)
from .options import ILQROptions


@dataclass(frozen=True)
class FDDPOptions:
    """Robust-solver knobs (static; hashable for jit).

    `gap_tol` (max|defect| for a CONVERGED status) defaults to None =
    DTYPE-RESOLVED at solve entry (resolve_gap_tol): 1e-8 under float64,
    1e-5 under float32/bfloat16. The f64 value is UNREACHABLE in f32 — the
    residual gaps floor at ~1e-5 from dynamics roundoff on O(1-10) states
    (measured p95 8.6e-6 on the aggressive-hover workload), so a fixed 1e-8
    default would burn every f32 lane's full iteration budget and report
    STATUS_MAX_ITERS for everyone. An EXPLICIT gap_tol is honored verbatim
    in any dtype (states scaled far from O(1) may legitimately need a
    different floor)."""

    reg_init: float = 1e-6  # first nonzero mu after a rejection at mu == 0
    reg_scale_up: float = 10.0  # mu multiplier on rejection
    reg_scale_down: float = 0.2  # mu multiplier on acceptance
    reg_min: float = 1e-9  # below this, mu snaps back to exactly 0
    reg_max: float = 1e8  # rejection at/above this is terminal
    goldstein_frac: float = 0.1  # accept frac of a predicted decrease
    goldstein_ub: float = 2.0  # tolerated multiple of a predicted increase
    gap_tol: float | None = None  # None = dtype-resolved (resolve_gap_tol)
    # mu warm schedule keyed on the ACCEPTED step length (the Crocoddyl
    # SolverFDDP rule): a full-ish step (alpha >= alpha_dec) decays mu, a
    # crawling step (alpha <= alpha_inc) RAISES it even though it was
    # accepted (the local model is untrustworthy — keep the next backward
    # pass conservative instead of paying a reject-retry trip to rediscover
    # it), anything between keeps mu. alpha_dec=0 recovers the round-3
    # always-decay-on-accept behavior.
    alpha_dec: float = 0.5  # accepted alpha >= this decays mu
    alpha_inc: float = 0.01  # accepted alpha <= this raises mu


def resolve_gap_tol(fddp_options: FDDPOptions, dtype) -> float:
    """The effective feasibility tolerance for a solve in `dtype`:
    an explicit FDDPOptions.gap_tol verbatim, else the dtype default
    (1e-8 for float64 where dynamics roundoff is ~1e-14; 1e-5 for
    float32/bfloat16 where the gap floor is ~1e-5 — see FDDPOptions).
    Every FDDP engine (XLA, whole-solve kernel, streamed kernel) resolves
    through here so the engines agree lane-for-lane."""
    if fddp_options.gap_tol is not None:
        return float(fddp_options.gap_tol)
    return 1e-8 if jnp.dtype(dtype) == jnp.float64 else 1e-5


def _next_alpha(alpha, cand_cost, cap, ls_step):
    """Escalated backtracking: one geometric step (alpha * ls_step) on an
    ordinary rejection, a k-step JUMP to ~0.1 alpha (k = round(log 0.1 /
    log ls_step) grid steps, 3 at the default ls_step 0.5) when the probe
    EXPLODED — candidate cost saturated at the probe cap (or NaN/inf on the
    raw first probe). Deep backtracks on diverging rollouts (the gyroscopic
    blowup lanes that dominate aggressive-class probe counts) stop paying
    one full probe per factor-of-2; healthy rejections keep the classic
    schedule, so accepted alphas stay on the 1, s, s^2, ... grid.

    Why a BINARY escalation instead of quadratic interpolation: an
    interpolated alpha is a continuous function of cand_cost - current,
    which (a) suffers catastrophic cancellation on mild rejections and
    (b) has a pole where the measured change matches the model's linear
    term — so the ~1e-16 evaluation differences between the lane kernels
    and the XLA path flip the chosen step ~1e-3 of the time and compound
    into divergent iterates (measured: 1-2/128 status flips on the mixed
    aggressive problem, in every interpolation variant tried). The
    explosion test `cand_cost < cap` is bit-deterministic across engines:
    probes accumulate cost with per-stage saturation at cap
    (_saturating_stage_cost_add), so a saturated candidate equals cap
    EXACTLY on both engines. Elementwise, one op order, shared verbatim by
    the XLA line search and the fused kernels (_goldstein_probe_commit)."""
    log_s = jnp.log(ls_step)
    k = jnp.maximum(jnp.floor(jnp.log(0.1) / log_s + 0.5), 1.0)
    # not-exploded == cand < cap (NaN/inf compare false -> escalate)
    return jnp.where(
        cand_cost < cap, alpha * ls_step, alpha * jnp.exp(k * log_s)
    )


def _probe_cap(thresh, current):
    """Saturation bound for line-search probe cost accumulation (strictly
    above the Goldstein accept threshold, so a saturated candidate is always
    rejected). Probes after the first accumulate cost with per-stage
    saturation c <- min(c + stage_cost, cap): stage costs are nonnegative
    (psd Q/R), so an ACCEPTED candidate (final cost <= thresh < cap) never
    binds the cap and its committed cost is exact, while a lane whose
    running cost ever reaches cap ends at EXACTLY cap no matter how many
    stages remain. That determinism is what lets the fused kernels
    early-terminate a probe rollout tile once every pending lane has
    saturated (kernels/fddp.py) while staying lane-for-lane identical to
    this XLA reference. Elementwise, one shared op order."""
    return 2.0 * (jnp.abs(thresh) + jnp.abs(current)) + 1.0


def _saturating_stage_cost_add(c, stage_c, gdj, current, cap):
    """One frozen-saturating accumulation step (shared op order with the
    kernels). Stage costs are nonnegative (psd Q/R; stage weights are
    assumed nonnegative — negative ones would only make the search more
    conservative, identically on every engine), so the running cost is
    nondecreasing and the Goldstein accept test (c - current) <= gdj is
    MONOTONE along the horizon: once a prefix fails it, the full candidate
    must fail it. The fold therefore FREEZES at the first crossing — using
    the accept test's EXACT arithmetic, so freeze implies reject
    bit-identically on every engine — which (a) makes the committed
    rejected value independent of where accumulation stops at or after the
    crossing (the kernels early-out the REST of the probe sweep on every
    rejected probe, not just exploding ones) and (b) preserves the
    escalation signal: a stage that EXPLODES before the crossing still
    saturates to exactly cap (NaN/inf land on cap too — the compare is
    false), the deterministic value _next_alpha's multi-step jump keys
    on. An accepted candidate never crosses, so its committed cost stays
    the exact full fold."""
    frozen = (c - current) > gdj
    c2 = c + stage_c
    c2 = jnp.where(c2 <= cap, c2, cap)
    return jnp.where(frozen, c, c2)


def defects(params, traj: Trajectory, dt_s, model=qm):
    """Multiple-shooting gaps d_k = f(x_k, u_k) (-) x_{k+1}, (..., N, 12);
    row N-1 is zero (no successor node)."""
    # highest precision like every solver entry point (CLAUDE.md): in f32 on
    # TPU, bf16 matmul passes here would leave ~1e-3 residual gaps that can
    # never satisfy gap_tol, and would pollute the v_x + V_xx d transport.
    with jax.default_matmul_precision("highest"):
        xs = traj.states
        x_next = model.discrete_dynamics(
            params,
            jax.tree.map(lambda leaf: leaf[..., :-1, :], xs),
            traj.controls[..., :-1, :],
            dt_s,
        )
        d = model.minus(x_next, jax.tree.map(lambda leaf: leaf[..., 1:, :], xs))
        zero = jnp.zeros(d.shape[:-2] + (1, 12), d.dtype)
        return jnp.concatenate([d, zero], axis=-2)


def _analytic_curvature_ok(params, model):
    """Static: does the ANALYTIC exact-curvature path apply? True for the
    rigid-body LaneModel family (the same families the fused kernels
    serve — solver/ddp.vfxx_analytic's derivation assumes the Lie-Euler
    pose step + [-g Rᵀe_z; -I⁻¹(ω×Iω)] drift + control-affine actuation).
    Families outside the protocol keep the model-generic nested-jacfwd
    tensors, as do SUBSTEPPED wrappers (the closed forms are single-step
    math — a k-substep stage map has a different, chained curvature)."""
    from ..kernels.models import lane_model_for

    try:
        return lane_model_for(params, model).substeps == 1
    except TypeError:
        return False


def _stage_derivs(params, cost, traj, dt_s, model, ddp):
    """Per-trajectory derivative bundle for the FDDP backward pass:
    (j_x, j_u, c_x, c_u, c_xx, c_uu[, curvature aux]). Split out so the
    adaptive-mu retry loop pays only the O(N m^2) Riccati scan — NOT the
    Lie-Jacobian quadratization or the curvature work, which dominate the
    per-iteration cost and are unchanged on a rejected trip (same
    trajectory, different mu only).

    With ddp on a rigid-body (LaneModel-family) problem the exact c_xx is
    the CLOSED-FORM one (solver/ddp.exact_cxx_analytic) and the bundle
    carries (quat, vel) per stage so the scan evaluates the analytic
    v_x-contracted dynamics curvature inline — the same formulas, in the
    same operation order, as the fused kernels, so kernel parity holds
    lane-for-lane. Other model families keep the nested-jacfwd f_xx
    tensor (solver/ddp.stage_curvatures)."""
    with jax.default_matmul_precision("highest"):
        j_x, j_u, c_x, c_u, c_xx, c_uu = quadratize(params, cost, traj, dt_s, model)
        if ddp:
            if _analytic_curvature_ok(params, model):
                from .ddp import exact_cxx_analytic

                c_xx = exact_cxx_analytic(cost, traj)
                return (
                    j_x, j_u, c_x, c_u, c_xx, c_uu,
                    traj.states.pose.quat, traj.states.vel,
                )
            from .ddp import stage_curvatures_joint

            # JOINT-tangent tensor (N, 12, 12+m, 12+m): substepped stage
            # maps have nonzero f_uu/f_xu (the control feeds every
            # substep), so the exact-curvature contraction must reach
            # Q_uu/Q_xu too — for single-step families those blocks are
            # exact zeros and this is value-identical to the old f_xx path
            f_xx, c_xx = stage_curvatures_joint(params, cost, traj, dt_s, model)
            return (j_x, j_u, c_x, c_u, c_xx, c_uu, f_xx)
        return (j_x, j_u, c_x, c_u, c_xx, c_uu)


def backward_pass_fddp(
    params, cost, traj, dt_s, d, quu_reg, model=qm, ddp=False, limits=None
):
    """Gap-transported Riccati recursion + the exact quadratic line-search
    model. Returns (ks, Ks, L1, L2) with dJ(alpha) = alpha L1 + alpha^2 L2.
    Single scenario (vmap for batches).

    `ddp=True` adds the full-DDP curvature (solver/ddp.py): exact cost
    Hessian and the v_x . f_xx dynamics term, weighted by the
    gap-TRANSPORTED value gradient. Bare `solve(..., ddp=True)` NaNs out on
    ~80% of large-attitude scenarios (exact curvature drives Quu
    indefinite, benchmarks/solvers_bench.py) — inside this loop the
    adaptive mu absorbs the indefiniteness, keeping DDP's iteration-count
    win safely usable.

    `limits=(lo, hi)` swaps the plain gain solve for the projected-Newton
    box-QP (solver/constrained.py semantics: clamped rows of K zeroed,
    general-gain value update) — robust infeasible-start solving under
    rotor saturation. The quadratic line-search model ignores the clamp
    (it predicts the FREE-direction change); the Goldstein band absorbs
    the model error, exactly as it absorbs the gap nonlinearity."""
    from .ddp import curvature_params

    derivs = _stage_derivs(params, cost, traj, dt_s, model, ddp)
    analytic = ddp and _analytic_curvature_ok(params, model)
    curv = curvature_params(params, traj.controls.dtype) if analytic else None
    return _backward_from_derivs(
        derivs, traj.controls, d, quu_reg, ddp, limits,
        analytic=analytic, curv=curv, dt_s=dt_s,
    )


def _backward_from_derivs(
    derivs, controls, d, quu_reg, ddp, limits,
    analytic=False, curv=None, dt_s=None, penalty=None,
):
    """The mu-dependent half of the FDDP backward pass (see
    backward_pass_fddp): Riccati scan + the exact quadratic model, from a
    precomputed derivative bundle. `analytic` (static) selects the
    closed-form dynamics-curvature evaluation (curv = (g, I, I⁻¹) from
    solver/ddp.curvature_params, with per-stage (quat, vel) in the bundle)
    vs the precomputed f_xx tensor.

    `penalty=(pcx, pcu, pcxx, pcuu, pcxu)` ((N, ...) per-stage quadratics
    — the AL PHR penalty, solver/auglag._pen_quads) augments the cost
    derivatives INCLUDING the nonzero C_xu cross term, so the robust
    multiple-shooting loop solves the constrained subproblem exactly like
    the exact-loop AL inner solver does (round 5: robust constrained
    flight). The first-order terms also feed the exact quadratic
    line-search model, keeping the Goldstein test consistent with the
    augmented cost the line search folds."""
    with jax.default_matmul_precision("highest"):
        if ddp and analytic:
            j_x, j_u, c_x, c_u, c_xx, c_uu, quats, vels = derivs
        elif ddp:
            j_x, j_u, c_x, c_u, c_xx, c_uu, f_xx = derivs
        else:
            j_x, j_u, c_x, c_u, c_xx, c_uu = derivs
        pen = penalty is not None
        if pen:
            pcx, pcu, pcxx, pcuu, pcxu = penalty
            c_x = c_x + pcx
            c_u = c_u + pcu
            c_xx = c_xx + pcxx
            c_uu = c_uu + pcuu
        box = limits is not None
        xs = [j_x, j_u, c_x, c_u, c_xx, c_uu, d]
        if pen:
            xs.append(pcxu)
        if ddp:
            if analytic:
                xs.append(quats)
                xs.append(vels)
            else:
                xs.append(f_xx)
        if box:
            from .constrained import _boxqp_gains

            lo = jnp.asarray(limits[0], controls.dtype)
            hi = jnp.asarray(limits[1], controls.dtype)
            xs.append(controls)
        xs = tuple(xs)
        m = controls.shape[-1]
        eye_m = jnp.eye(m, dtype=controls.dtype)

        def stage(carry, inputs):
            v_x, v_xx = carry
            inputs = list(inputs)
            u_now = inputs.pop() if box else None
            quat_n = vel_n = fxx = None
            if ddp:
                if analytic:
                    vel_n = inputs.pop()
                    quat_n = inputs.pop()
                else:
                    fxx = inputs.pop()
            cxu_pen = inputs.pop() if pen else None
            jx, ju, cx, cu, cxx, cuu, dk = inputs
            # first-order value transport across the gap (FDDP)
            v_x_eff = v_x + v_xx @ dk
            jxt = jnp.swapaxes(jx, -1, -2)
            jut = jnp.swapaxes(ju, -1, -2)
            vxx_ju = v_xx @ ju
            q_x = cx + jxt @ v_x_eff
            q_u = cu + jut @ v_x_eff
            q_xx = cxx + jxt @ (v_xx @ jx)
            vfull = None
            if ddp and analytic:
                from .ddp import vfxx_analytic

                g_m, inertia, inertia_inv = curv
                q_xx = q_xx + vfxx_analytic(
                    dt_s, quat_n, vel_n, g_m, inertia, inertia_inv, v_x_eff
                )
            elif ddp:
                # joint-tangent contraction (stage_curvatures_joint):
                # xx block always; uu/xu blocks are exact zeros for
                # single-step families and the chained curvature for
                # substepped ones
                vfull = jnp.einsum("i,iab->ab", v_x_eff, fxx)
                q_xx = q_xx + vfull[:12, :12]
            q_uu = cuu + jut @ vxx_ju + jnp.asarray(quu_reg, cuu.dtype) * eye_m
            q_xu = jxt @ vxx_ju
            if pen:
                q_xu = q_xu + cxu_pen
            if vfull is not None:
                q_uu = q_uu + vfull[12:, 12:]
                q_xu = q_xu + vfull[:12, 12:]
            if box:
                q_ux = jnp.swapaxes(q_xu, -1, -2)
                k, big_k = _boxqp_gains(
                    q_uu, q_u, q_ux, lo - u_now, hi - u_now
                )
                quu_k = q_uu @ k
                big_kt = jnp.swapaxes(big_k, -1, -2)
                # general-gain value update (clamped rows of K are zero);
                # same load-bearing symmetrization as riccati_gains_update
                v_x_new = q_x + big_kt @ quu_k + big_kt @ q_u + q_xu @ k
                s = q_xx + q_xu @ big_k + big_kt @ q_ux + big_kt @ q_uu @ big_k
                v_xx_new = 0.5 * (s + jnp.swapaxes(s, -1, -2))
            else:
                k, big_k, v_x_new, v_xx_new, _, _ = riccati_gains_update(
                    q_x, q_u, q_xx, q_uu, q_xu
                )
            return (v_x_new, v_xx_new), (k, big_k)

        dtype = controls.dtype
        init = (jnp.zeros((12,), dtype), jnp.zeros((12, 12), dtype))
        _, (ks, big_ks) = jax.lax.scan(stage, init, xs, reverse=True)

        # Exact quadratic model of the gap-contracting rollout:
        # dx_k = alpha p_k, du_k = alpha w_k (both exactly linear in alpha).
        # With a penalty the model carries its C_xu cross term too.
        def fwd(p, inputs):
            if pen:
                jx, ju, cx, cu, cxx, cuu, dk, k, big_k, cxu_p = inputs
            else:
                jx, ju, cx, cu, cxx, cuu, dk, k, big_k = inputs
            w = k + big_k @ p
            l1 = cx @ p + cu @ w
            l2 = 0.5 * (p @ (cxx @ p) + w @ (cuu @ w))
            if pen:
                l2 = l2 + p @ (cxu_p @ w)
            return jx @ p + ju @ w + dk, (l1, l2)

        fwd_xs = (j_x, j_u, c_x, c_u, c_xx, c_uu, d, ks, big_ks)
        if pen:
            fwd_xs = fwd_xs + (pcxu,)
        _, (l1s, l2s) = jax.lax.scan(
            fwd, jnp.zeros((12,), dtype), fwd_xs
        )
        return ks, big_ks, jnp.sum(l1s), jnp.sum(l2s)


def rollout_gap(params, traj, d, ks, big_ks, alpha, dt_s, model=qm, limits=None):
    """Gap-contracting closed-loop rollout: a step of length alpha closes an
    alpha-fraction of every gap (new defect == (1-alpha) d to first order);
    alpha == 1 with zero gaps is exactly the reference rollout
    (ilqr.hh:149-172). `limits=(lo, hi)` clamps every produced control
    (control-limited rollouts, solver/constrained.py semantics)."""
    with jax.default_matmul_precision("highest"):
        x0 = jax.tree.map(lambda leaf: leaf[..., 0, :], traj.states)
        n_axis = traj.controls.ndim - 2

        def to_front(a):
            return jnp.moveaxis(a, n_axis, 0)

        xs = (
            jax.tree.map(to_front, traj.states),
            to_front(traj.controls),
            to_front(ks),
            to_front(big_ks),
            to_front(d),
        )

        def stage(state, inputs):
            x_old, u_old, k, big_k, dk = inputs
            dx = model.minus(state, x_old)
            u = u_old + alpha[..., None] * k + jnp.einsum(
                "...ij,...j->...i", big_k, dx
            )
            if limits is not None:
                u = jnp.clip(u, limits[0], limits[1])
            nxt = model.discrete_dynamics(params, state, u, dt_s)
            nxt = model.add(nxt, -(1.0 - alpha[..., None]) * dk)
            return nxt, (state, u)

        _, (states, controls) = jax.lax.scan(stage, x0, xs)
        states = jax.tree.map(lambda leaf: jnp.moveaxis(leaf, 0, n_axis), states)
        controls = jnp.moveaxis(controls, 0, n_axis)
        return Trajectory(times=traj.times, states=states, controls=controls)


@partial(
    jax.jit,
    static_argnames=(
        "options", "dt_s", "fddp_options", "model", "ddp", "penalty_fns",
    ),
)
def solve_fddp(
    params,
    cost: qc.QuadraticTrackingCost,
    initial_traj: Trajectory,
    dt_s: float,
    options: ILQROptions = ILQROptions(),
    fddp_options: FDDPOptions = FDDPOptions(),
    model=None,
    ddp: bool = False,
    limits=None,
    penalty_fns=None,
    penalty_args=None,
) -> SolveResult:
    """Robust infeasible-start solve for ONE scenario (vmap for batches).

    Same inputs/outputs as `solver.ilqr.solve`; see the module docstring for
    how the loop differs (gap contraction, Goldstein acceptance, adaptive
    mu). `options.quu_reg` is a static floor under the adaptive term;
    `options.populate_debug` is not supported here (debug stays None).
    `ddp=True` adds the full-DDP curvature terms with the adaptive mu
    absorbing the indefiniteness they can introduce (see
    backward_pass_fddp) — the robust way to run DDP. `limits=(lo, hi)`
    ((m,)-broadcastable control bounds) runs the box-QP stage + clamped
    gap rollouts: robust solving under actuator saturation; with
    non-binding bounds it reduces to the unconstrained solve.

    `penalty_fns=(value_fn, quads_fn)` (STATIC callables) makes the loop
    solve an AUGMENTED problem exactly (round 5: the robust inner solver
    of solver/auglag.solve_auglag(robust=True)):
    `value_fn(states, controls, penalty_args) -> (N,)` per-stage extra
    cost folded into cost0 and every line-search candidate;
    `quads_fn(traj, penalty_args) -> (pcx, pcu, pcxx, pcuu, pcxu)`
    per-stage quadratics (re-evaluated at each accepted iterate) added to
    the derivative bundle incl. the C_xu cross term. `penalty_args` is a
    TRACED operand pytree (the AL multipliers (lam, mu)) threaded to both
    callables — the outer AL loop can update it without retracing. The
    returned `cost` is the AUGMENTED cost; the AL driver reports the true
    cost itself.
    """
    model = qm if model is None else model
    fo = fddp_options
    analytic = ddp and _analytic_curvature_ok(params, model)
    if analytic:
        from .ddp import curvature_params

        curv = curvature_params(params, initial_traj.controls.dtype)
    else:
        curv = None
    max_iters = int(options.convergence_criteria.max_iters)
    ls = options.line_search_params
    dtype = initial_traj.controls.dtype
    gap_tol = resolve_gap_tol(fo, dtype)
    cost0 = qc.trajectory_cost(cost, initial_traj.states, initial_traj.controls)
    if penalty_fns is not None:
        pen_value, pen_quads = penalty_fns
        cost0 = cost0 + jnp.sum(
            pen_value(
                initial_traj.states, initial_traj.controls, penalty_args
            )
        )

    def line_search(traj, d, current, ks, big_ks, l1, l2):
        def cond(carry):
            i, _, _, _, _, accepted = carry
            return jnp.logical_and(i < ls.max_iters, jnp.logical_not(accepted))

        def body(carry):
            i, step, _, _, _, _ = carry
            t = rollout_gap(
                params, traj, d, ks, big_ks, step, dt_s, model, limits
            )
            dj = step * l1 + step * step * l2
            gmult = jnp.where(dj <= 0, fo.goldstein_frac, fo.goldstein_ub)
            gdj = gmult * dj
            # probe 0 evaluates the raw cost; later probes accumulate with
            # the frozen-saturating fold (_saturating_stage_cost_add):
            # freeze at the first Goldstein crossing, saturate explosions
            # at cap — the deterministic rejected values the kernels' tile
            # early-out depends on. An accepted candidate never crosses, so
            # committed costs are exact either way.
            scs = qc.per_stage_costs(cost, t.states, t.controls)
            if penalty_fns is not None:
                scs = scs + pen_value(t.states, t.controls, penalty_args)
            cap = _probe_cap(current + gdj, current)

            def sat_fold(c, s):
                return _saturating_stage_cost_add(c, s, gdj, current, cap), None

            c_sat, _ = jax.lax.scan(sat_fold, jnp.zeros((), dtype), scs)
            c = jnp.where(i == 0, jnp.sum(scs), c_sat)
            accept = (c - current) <= gdj
            accept = jnp.logical_and(accept, jnp.abs(c) < jnp.inf)
            step_next = _next_alpha(step, c, cap, ls.step_update)
            return (i + 1, step_next, step, t, c, accept)

        init = (
            jnp.asarray(0, jnp.int32),
            jnp.ones((), dtype),
            jnp.ones((), dtype),
            traj,
            current,
            jnp.zeros((), bool),
        )
        _, _, step_used, t, c, accepted = jax.lax.while_loop(cond, body, init)
        return t, c, accepted, step_used

    def cond(carry):
        i, _, _, _, done, _ = carry
        return jnp.logical_and(i < max_iters, jnp.logical_not(done))

    def body(carry):
        """One ACCEPTED update (or a terminal failure / budget exhaustion).

        Derivatives (the Lie-Jacobian quadratization and, with ddp, the
        nested-jacfwd curvature tensors — the dominant per-iteration cost)
        depend only on the trajectory, so they are computed ONCE here; the
        inner loop retries only the mu-dependent Riccati scan + rollouts as
        the Levenberg schedule ramps. Identical math to retrying the whole
        body (a rejected trip leaves the trajectory unchanged, so the
        recomputed derivatives were bit-identical) at a fraction of the
        cost.
        """
        i, traj, new_cost, mu, done, status = carry
        d = defects(params, traj, dt_s, model)
        gap = jnp.max(jnp.abs(d))
        derivs = _stage_derivs(params, cost, traj, dt_s, model, ddp)
        pen = (
            pen_quads(traj, penalty_args)
            if penalty_fns is not None
            else None
        )
        current = new_cost

        def retry_cond(rc):
            trips, _, accepted, terminal, _, _ = rc
            return jnp.logical_and(
                trips < max_iters,
                jnp.logical_and(
                    jnp.logical_not(accepted), jnp.logical_not(terminal)
                ),
            )

        def retry_body(rc):
            trips, mu_r, _, _, _, _ = rc
            ks, big_ks, l1, l2 = _backward_from_derivs(
                derivs, traj.controls, d, options.quu_reg + mu_r, ddp, limits,
                analytic=analytic, curv=curv, dt_s=dt_s, penalty=pen,
            )
            t, c, accepted, step_used = line_search(
                traj, d, current, ks, big_ks, l1, l2
            )
            headroom = mu_r < fo.reg_max
            terminal = jnp.logical_and(
                jnp.logical_not(accepted), jnp.logical_not(headroom)
            )
            mu_dec = mu_r * fo.reg_scale_down
            mu_dec = jnp.where(mu_dec < fo.reg_min, 0.0, mu_dec)
            mu_inc = jnp.where(
                mu_r == 0.0,
                fo.reg_init,
                jnp.minimum(mu_r * fo.reg_scale_up, fo.reg_max),
            )
            # accepted steps consult the step length (Crocoddyl warm
            # schedule): decay only on confident (long) steps, RAISE on
            # crawling ones — saves the reject trip that would otherwise
            # rediscover the bad local model next iteration
            mu_accept = jnp.where(
                step_used >= fo.alpha_dec,
                mu_dec,
                jnp.where(step_used <= fo.alpha_inc, mu_inc, mu_r),
            )
            mu_next = jnp.where(
                accepted, mu_accept, jnp.where(terminal, mu_r, mu_inc)
            )
            return (trips + 1, mu_next, accepted, terminal, t, c)

        trips, mu2, accepted, terminal_fail, t, c = jax.lax.while_loop(
            retry_cond,
            retry_body,
            (i, mu, jnp.zeros((), bool), jnp.zeros((), bool), traj, current),
        )

        keep = jnp.logical_not(accepted)
        traj2 = jax.tree.map(lambda cand, cur: jnp.where(keep, cur, cand), t, traj)
        cost2 = jnp.where(keep, current, c)

        # converged = cost criterion on an ACCEPTED full-feasibility iterate:
        # the pre-update gap must already be closed (a partial step leaves
        # (1-alpha) of it) and the accepted candidate changes the cost less
        # than the tolerance.
        feasible = gap < gap_tol
        post_conv = jnp.logical_and(
            jnp.logical_and(accepted, feasible),
            is_converged(current, c, options),
        )
        status2 = jnp.where(
            terminal_fail,
            STATUS_LINE_SEARCH_FAILED,
            jnp.where(post_conv, STATUS_CONVERGED, STATUS_MAX_ITERS),
        ).astype(jnp.int32)
        done2 = jnp.logical_or(post_conv, terminal_fail)
        return (trips, traj2, cost2, mu2, done2, status2)

    init = (
        jnp.zeros((), jnp.int32),
        initial_traj,
        cost0,
        jnp.zeros((), dtype),
        jnp.zeros((), bool),
        jnp.asarray(STATUS_MAX_ITERS, jnp.int32),
    )
    i, traj, final_cost, _, _, status = jax.lax.while_loop(cond, body, init)
    return SolveResult(
        trajectory=traj, cost=final_cost, iterations=i, status=status, debug=None
    )
