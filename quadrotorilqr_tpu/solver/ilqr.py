"""iLQR solver — the reference loop (/root/reference/src/ilqr.hh:53-205)
re-derived as compiled JAX control flow, TPU-first.

Architecture (NOT a translation of the C++):

  * Trajectories are stacked structure-of-arrays (leading axis = horizon N),
    not vectors of structs — one HBM layout for the whole solve.
  * The backward pass splits into (a) a horizon-PARALLEL quadratization
    (dynamics Jacobians + cost differentials for all N stages at once — all
    the Lie-group trig lives here and vectorizes over stages x scenarios) and
    (b) the inherently sequential Riccati recursion as a reverse `lax.scan`
    whose body is only small matmuls + one 4x4 solve (ilqr.hh:109-141).
  * The forward rollout is a `lax.scan` (ilqr.hh:149-172).
  * The backtracking line search is a bounded `lax.while_loop`
    (ilqr.hh:174-194); exhaustion sets a per-scenario status flag instead of
    throwing, so batched solves keep running (SURVEY.md §5.3).
  * The outer iteration loop is a `lax.while_loop` carrying
    (trajectory, cost, iter, status) reproducing the exact reference
    semantics: iteration 0 always takes a full forward step (the initial
    trajectory may be dynamically infeasible), and both the pre-check on the
    expected cost and the post-check on the achieved cost gate convergence
    only for i > 0 (ilqr.hh:58-84).

Everything is batchable with vmap (while_loops batch to masked fixed-point
iteration) and shardable with shard_map over a scenario mesh axis.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from ..ops.linalg import chol_solve_small

from ..costs import quadratic as qc
from ..models import quadrotor as qm
from ..models.quadrotor import QuadrotorParams, State
from .options import ILQROptions

# Per-scenario status codes (replaces the reference's exceptions).
STATUS_MAX_ITERS = 0  # ran to convergence_criteria.max_iters
STATUS_CONVERGED = 1
STATUS_LINE_SEARCH_FAILED = 2  # reference throws (ilqr.hh:191-193)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class Trajectory:
    """Stacked trajectory: times (...,N), states (leaves (...,N,d)), controls (...,N,4)."""

    times: jax.Array
    states: State
    controls: jax.Array

    @property
    def horizon(self):
        return self.controls.shape[-2]


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class IterDebug:
    """Per-iteration debug record (ilqr_debug.hh:9-22) as fixed-size stacked
    buffers indexed by iteration; `valid[i]` marks populated slots."""

    trajectories: Trajectory  # leaves (..., max_iters, N, d)
    costs: jax.Array  # (..., max_iters)
    valid: jax.Array  # (..., max_iters) bool


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class CostHistory:
    """Lightweight per-iteration debug record: the cost/valid buffers of
    IterDebug WITHOUT the trajectory snapshots — cheap enough for the
    whole-solve kernels to emit from VMEM (kernels/solve.py
    record_history), so `populate_debug` no longer forces the slower
    batch-loop engine (solver/batched.solve_batch_latency). Request full
    trajectory snapshots via solve_batch_fused when needed."""

    costs: jax.Array  # (..., max_iters)
    valid: jax.Array  # (..., max_iters) bool


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class SolveResult:
    trajectory: Trajectory
    cost: jax.Array  # (...)
    iterations: jax.Array  # (...) int32: loop trips executed
    status: jax.Array  # (...) int32: STATUS_*
    debug: IterDebug | None


def quadratize(params, cost: qc.QuadraticTrackingCost, traj: Trajectory, dt_s, model=qm):
    """Stage-parallel quadratization for ALL N stages at once.

    Returns (j_x (N,12,12), j_u (N,12,m), c_x (N,12), c_u (N,m),
    c_xx (N,12,12), c_uu (N,m,m)). This is the hot math (Lie Jacobians,
    trig, 3x3 solves) — hoisted out of the sequential recursion so it runs
    across the whole horizon in parallel (the C++ does it stage-by-stage
    inside the reverse loop, ilqr.hh:110-116).

    `model` is any module satisfying the model protocol over `State`
    (the reference's `template <class ModelT>`, ilqr.hh:25): it sets the
    control dimension m (quadrotor: 4; models/se3_wrench: 6).
    """
    _, j_x, j_u = model.discrete_dynamics_jacobians(params, traj.states, traj.controls, dt_s)
    _, c_x, c_u, c_xx, c_uu = qc.stage_cost_with_diffs(
        cost, traj.states, traj.controls, cost.desired_states, cost.desired_controls
    )
    # c_uu = 2R is stage-independent — broadcast it onto the horizon axis.
    c_uu = jnp.broadcast_to(c_uu, c_u.shape[:-1] + c_uu.shape[-2:])
    return j_x, j_u, c_x, c_u, c_xx, c_uu


def backward_pass(
    params,
    cost: qc.QuadraticTrackingCost,
    traj: Trajectory,
    dt_s,
    quu_reg=0.0,
    model=qm,
):
    """Riccati recursion (ilqr.hh:97-147).

    Returns (ks (N,m), Ks (N,m,12), QuTk, kTQuuk). With quu_reg == 0 the Quu
    solve is plain, matching ilqr.hh:126-128 (reference parity); quu_reg > 0
    adds Levenberg-style damping (robust mode, SURVEY.md hard-part 4).
    """
    # f32 on TPU: the default matmul precision routes through bf16 MXU
    # passes, which wrecks the unregularized Quu (NaNs on the demo workload)
    # — force full-f32 accumulation for the whole pass.
    with jax.default_matmul_precision("highest"):
        return _backward_pass_hp(params, cost, traj, dt_s, quu_reg, model)


def apply_quu_reg(q_uu, quu_reg):
    """Levenberg damping. Static 0.0 skips the add entirely (reference
    parity, ilqr.hh:126); a traced quu_reg (e.g. solver/fddp.py's adaptive
    schedule) always adds — jnp.asarray handles both scalar kinds."""
    if isinstance(quu_reg, (int, float)) and quu_reg == 0.0:
        return q_uu
    return q_uu + jnp.asarray(quu_reg, q_uu.dtype) * jnp.eye(
        q_uu.shape[-1], dtype=q_uu.dtype
    )


def riccati_gains_update(q_x, q_u, q_xx, q_uu, q_xu):
    """The ONE XLA-side definition of the unconstrained per-stage tail:
    gain solve + value update + symmetrization (ilqr.hh:126-140). Shared by
    every XLA Riccati stage (ilqr, ddp, fddp, auglag — they differ only in
    how the Q-expansion is assembled); the kernel-side counterpart is
    kernels/backward._riccati_stage. Batch-polymorphic.

    Returns (k, big_k, v_x', v_xx', qutk_inc, ktquuk_inc).

    One mx(1+12) solve for [k | K] (ilqr.hh:126-128): Quu is symmetric and
    SPD whenever R is (reference LDLT-factorizes it, no regularization);
    the unrolled small Cholesky compiles to straight-line code inside scan
    bodies (ops/linalg.py). The per-stage symmetrization of v_xx is
    LOAD-BEARING: f32 otherwise amplifies roundoff asymmetry exponentially
    and NaNs past N~500 (same fix as kernels/backward._riccati_stage); in
    f64 it changes results at ~1e-16 only."""
    rhs = jnp.concatenate([q_u[..., None], jnp.swapaxes(q_xu, -1, -2)], axis=-1)
    sol = -chol_solve_small(q_uu, rhs)
    k = sol[..., 0]
    big_k = sol[..., 1:]

    quu_k = jnp.einsum("...ij,...j->...i", q_uu, k)
    big_kt = jnp.swapaxes(big_k, -1, -2)
    v_x_new = q_x - jnp.einsum("...ij,...j->...i", big_kt, quu_k)
    s = q_xx - big_kt @ q_uu @ big_k
    v_xx_new = 0.5 * (s + jnp.swapaxes(s, -1, -2))
    qutk_inc = jnp.einsum("...i,...i->...", q_u, k)
    ktquuk_inc = jnp.einsum("...i,...i->...", k, quu_k)
    return k, big_k, v_x_new, v_xx_new, qutk_inc, ktquuk_inc


def _backward_pass_hp(params, cost, traj, dt_s, quu_reg, model=qm):
    j_x, j_u, c_x, c_u, c_xx, c_uu = quadratize(params, cost, traj, dt_s, model)

    def stage(carry, inputs):
        v_x, v_xx, qutk, ktquuk = carry
        jx, ju, cx, cu, cxx, cuu = inputs
        jxt = jnp.swapaxes(jx, -1, -2)
        jut = jnp.swapaxes(ju, -1, -2)
        vxx_jx = v_xx @ jx
        vxx_ju = v_xx @ ju
        q_x = cx + jnp.einsum("...ij,...j->...i", jxt, v_x)
        q_u = cu + jnp.einsum("...ij,...j->...i", jut, v_x)
        q_xx = cxx + jxt @ vxx_jx
        q_uu = apply_quu_reg(cuu + jut @ vxx_ju, quu_reg)
        q_xu = jxt @ vxx_ju  # C.xu == 0 exactly (cost.hh:57)

        k, big_k, v_x_new, v_xx_new, qutk_inc, ktquuk_inc = (
            riccati_gains_update(q_x, q_u, q_xx, q_uu, q_xu)
        )
        return (
            (v_x_new, v_xx_new, qutk + qutk_inc, ktquuk + ktquuk_inc),
            (k, big_k),
        )

    batch = traj.controls.shape[:-2]
    dtype = traj.controls.dtype
    init = (
        jnp.zeros(batch + (12,), dtype),
        jnp.zeros(batch + (12, 12), dtype),
        jnp.zeros(batch, dtype),
        jnp.zeros(batch, dtype),
    )
    # reverse scan over the horizon axis (axis -3 for matrices, but scan works
    # on axis 0 — move horizon to front for the scan inputs).
    n_axis = traj.controls.ndim - 2
    xs = jax.tree.map(lambda a: jnp.moveaxis(a, n_axis, 0), (j_x, j_u, c_x, c_u, c_xx, c_uu))
    (_, _, qutk, ktquuk), (ks, big_ks) = jax.lax.scan(stage, init, xs, reverse=True)
    ks = jnp.moveaxis(ks, 0, n_axis)
    big_ks = jnp.moveaxis(big_ks, 0, n_axis)
    return ks, big_ks, qutk, ktquuk


def expected_cost_reduction(qutk, ktquuk, step=1.0):
    """dJ(step) = step*Qu'k + step^2 * k'Quu k / 2 (ilqr.hh:18-22)."""
    return step * qutk + step * step * ktquuk / 2.0


def forward_sim(
    params,
    traj: Trajectory,
    ks,
    big_ks,
    alpha,
    dt_s,
    model=qm,
):
    """Closed-loop rollout (ilqr.hh:149-172):
    u_i = u_old_i + alpha*k_i + K_i (x (-) x_old_i); x_{i+1} = f(x_i, u_i)."""
    with jax.default_matmul_precision("highest"):
        return _forward_sim_hp(params, traj, ks, big_ks, alpha, dt_s, model)


def _forward_sim_hp(params, traj, ks, big_ks, alpha, dt_s, model=qm):
    x0 = jax.tree.map(lambda leaf: leaf[..., 0, :], traj.states)
    n_axis = traj.controls.ndim - 2

    def to_front(a):
        return jnp.moveaxis(a, n_axis, 0)

    xs = (
        jax.tree.map(to_front, traj.states),
        to_front(traj.controls),
        to_front(ks),
        to_front(big_ks),
    )

    def stage(state, inputs):
        x_old, u_old, k, big_k = inputs
        dx = model.minus(state, x_old)
        u = u_old + alpha[..., None] * k + jnp.einsum("...ij,...j->...i", big_k, dx)
        next_state = model.discrete_dynamics(params, state, u, dt_s)
        return next_state, (state, u)

    _, (states, controls) = jax.lax.scan(stage, x0, xs)
    states = jax.tree.map(lambda leaf: jnp.moveaxis(leaf, 0, n_axis), states)
    controls = jnp.moveaxis(controls, 0, n_axis)
    return Trajectory(times=traj.times, states=states, controls=controls)


def line_search(
    params,
    cost: qc.QuadraticTrackingCost,
    traj: Trajectory,
    current_cost,
    ks,
    big_ks,
    qutk,
    ktquuk,
    dt_s,
    options: ILQROptions,
    model=qm,
):
    """Backtracking line search (ilqr.hh:174-194).

    Returns (new_traj, new_cost, ok). `ok=False` corresponds to the
    reference's std::runtime_error on exhaustion; the carried trajectory is
    then the last (smallest-step) candidate.
    """
    ls = options.line_search_params
    dtype = traj.controls.dtype
    one = jnp.asarray(1.0, dtype)

    def try_step(step):
        new_traj = forward_sim(params, traj, ks, big_ks, step, dt_s, model)
        new_cost = qc.trajectory_cost(cost, new_traj.states, new_traj.controls)
        desired = ls.desired_reduction_frac * expected_cost_reduction(qutk, ktquuk, step)
        accept = (new_cost - current_cost) < desired
        return new_traj, new_cost, accept

    def cond(carry):
        i, _, _, _, accepted = carry
        return jnp.logical_and(i < ls.max_iters, jnp.logical_not(accepted))

    def body(carry):
        i, step, _, _, _ = carry
        new_traj, new_cost, accept = try_step(step)
        return (i + 1, step * ls.step_update, new_traj, new_cost, accept)

    init = (
        jnp.asarray(0, jnp.int32),
        jnp.broadcast_to(one, current_cost.shape),
        traj,
        current_cost,
        jnp.zeros(current_cost.shape, bool),
    )
    _, _, new_traj, new_cost, accepted = jax.lax.while_loop(cond, body, init)
    return new_traj, new_cost, accepted


def is_converged(cost, new_cost, options: ILQROptions):
    """ilqr.hh:196-205: rel OR abs criterion.

    The relative test is the division-free form `diff < rtol*|cost|` — same
    truth table as the reference's `diff/|cost| < rtol` for |cost| > 0, but a
    zero-cost lane yields a deterministic False (0 < 0) instead of a NaN
    comparison, so batched lanes at exact zero cost fall through to the
    absolute criterion instead of tripping NaN checkers."""
    cc = options.convergence_criteria
    diff = jnp.abs(cost - new_cost)
    return jnp.logical_or(diff < cc.rtol * jnp.abs(cost), diff < cc.atol)


def _empty_debug(traj: Trajectory, max_iters):
    trajs = jax.tree.map(lambda leaf: jnp.zeros((max_iters,) + leaf.shape, leaf.dtype), traj)
    return IterDebug(
        trajectories=trajs,
        costs=jnp.zeros((max_iters,), traj.controls.dtype),
        valid=jnp.zeros((max_iters,), bool),
    )


def _write_debug(debug: IterDebug, i, traj: Trajectory, cost):
    trajs = jax.tree.map(
        lambda buf, leaf: jax.lax.dynamic_update_index_in_dim(buf, leaf, i, 0),
        debug.trajectories,
        traj,
    )
    return IterDebug(
        trajectories=trajs,
        costs=debug.costs.at[i].set(cost),
        valid=debug.valid.at[i].set(True),
    )


# associative="auto" dispatch frontier, measured on v5e 2026-08-20
# (benchmarks/assoc_regime.py grid; re-run after kernel/compiler changes).
# The O(log N) pass costs ~3x the flops per stage, so it wins only where
# DEPTH dominates — tiny batch x long horizon. Measured cells (p50, full
# solves, f32): B=1 it wins from N=512 (1288->1268 ms) through N=2048
# (5069->4983); B=8 it wins at N=512 (260->247) but LOSES at N=2048
# (1046 vs 1425 — 8 lanes x 2048 stages already fill the chip); B>=64
# sequential wins everywhere measured. The wins are 2-5% — the settled
# verdict is that scenario parallelism dominates this problem class and
# parallel-in-time is a latency niche (BENCH_LOCAL.md), kept because the
# niche (single-scenario long-horizon MPC replanning) is real.
ASSOC_AUTO_MIN_HORIZON = 512
ASSOC_AUTO_LANE_BUDGET = 4096  # assoc iff batch <= max(1, budget/horizon)


def resolve_associative(batch: int, horizon: int) -> bool:
    """The associative="auto" rule: parallel-in-time Riccati iff the
    (batch, horizon) cell is inside the measured win region of
    benchmarks/assoc_regime.py (see the frontier note above — every
    measured cell agrees with this predicate)."""
    return horizon >= ASSOC_AUTO_MIN_HORIZON and batch <= max(
        1, ASSOC_AUTO_LANE_BUDGET // horizon
    )


@partial(
    jax.jit, static_argnames=("options", "dt_s", "associative", "model", "ddp")
)
def solve(
    params,
    cost: qc.QuadraticTrackingCost,
    initial_traj: Trajectory,
    dt_s: float,
    options: ILQROptions = ILQROptions(),
    associative: bool = False,
    model=None,
    ddp: bool = False,
) -> SolveResult:
    """Full iLQR solve (ilqr.hh:53-87) for ONE scenario (vmap for batches).

    `associative=True` swaps the sequential Riccati scan for the O(log N)
    parallel-in-time backward pass (solver/parallel_riccati.py) — same
    results (f64 parity ~1e-8), lower latency for long horizons.

    `ddp=True` swaps in the full-DDP backward pass (solver/ddp.py): exact
    second-order dynamics/cost curvature in Q_xx — same stationary points,
    locally quadratic convergence on strongly nonlinear problems, at a
    higher per-iteration cost (nested-autodiff curvature tensors).

    `model` is the model module (the reference's `template <class ModelT>`
    type parameter, ilqr.hh:25): any module exposing `discrete_dynamics`,
    `discrete_dynamics_jacobians`, and `minus` over the shared `State`
    works — models/quadrotor (default; None also selects it, so callers can
    thread an optional model straight through), models/se3_wrench
    (fully-actuated body wrench, 6 controls). `params` is whatever params
    pytree that module expects.

    Exact reference semantics:
      i == 0: unconditionally forward-simulate the initial control sequence
              at alpha=1 (makes an infeasible initial trajectory feasible).
      i > 0 : pre-check on expected cost -> return untouched trajectory;
              line search; post-check on achieved cost.
    """
    model = qm if model is None else model
    max_iters = int(options.convergence_criteria.max_iters)
    new_cost0 = qc.trajectory_cost(cost, initial_traj.states, initial_traj.controls)
    debug0 = _empty_debug(initial_traj, max_iters) if options.populate_debug else None

    if associative == "auto":
        associative = resolve_associative(1, initial_traj.controls.shape[0])
    if associative and ddp:
        raise ValueError("associative=True and ddp=True are mutually exclusive")
    if associative:
        from .parallel_riccati import backward_pass_assoc as _backward
    elif ddp:
        from .ddp import backward_pass_ddp as _backward
    else:
        _backward = backward_pass

    def cond(carry):
        i, _, _, done, _, _ = carry
        return jnp.logical_and(i < max_iters, jnp.logical_not(done))

    def body(carry):
        i, traj, new_cost, done, status, debug = carry
        ks, big_ks, qutk, ktquuk = _backward(
            params, cost, traj, dt_s, options.quu_reg, model
        )
        current = new_cost

        expected = current + expected_cost_reduction(qutk, ktquuk)
        pre_conv = jnp.logical_and(i > 0, is_converged(current, expected, options))

        def do_update(_):
            def first_iter(_):
                t = forward_sim(
                    params, traj, ks, big_ks, jnp.asarray(1.0, current.dtype), dt_s, model
                )
                c = qc.trajectory_cost(cost, t.states, t.controls)
                return t, c, jnp.ones((), bool)

            def later_iter(_):
                return line_search(
                    params, cost, traj, current, ks, big_ks, qutk, ktquuk, dt_s,
                    options, model,
                )

            t, c, ls_ok = jax.lax.cond(i == 0, first_iter, later_iter, None)
            post_conv = jnp.logical_and(i > 0, is_converged(current, c, options))
            new_status = jnp.where(
                jnp.logical_not(ls_ok),
                STATUS_LINE_SEARCH_FAILED,
                jnp.where(post_conv, STATUS_CONVERGED, STATUS_MAX_ITERS),
            )
            new_done = jnp.logical_or(post_conv, jnp.logical_not(ls_ok))
            return t, c, new_done, new_status.astype(jnp.int32)

        def pre_converged(_):
            return traj, new_cost, jnp.ones((), bool), jnp.asarray(STATUS_CONVERGED, jnp.int32)

        traj2, cost2, done2, status2 = jax.lax.cond(pre_conv, pre_converged, do_update, None)

        if options.populate_debug:
            # debug is appended only when an update actually ran (ilqr.hh:78-80)
            debug = jax.lax.cond(
                pre_conv, lambda d: d, lambda d: _write_debug(d, i, traj2, cost2), debug
            )
        # A pre-converged trip executes no update: don't count it (the
        # reference returns with i updates applied, ilqr.hh:66-68).
        i_next = jnp.where(pre_conv, i, i + 1)
        return (i_next, traj2, cost2, done2, status2, debug)

    init = (
        jnp.zeros((), jnp.int32),
        initial_traj,
        new_cost0,
        jnp.zeros((), bool),
        jnp.asarray(STATUS_MAX_ITERS, jnp.int32),
        debug0,
    )
    i, traj, final_cost, done, status, debug = jax.lax.while_loop(cond, body, init)
    return SolveResult(
        trajectory=traj,
        cost=final_cost,
        iterations=i,
        status=status,
        debug=debug,
    )


# ---------------------------------------------------------------------------
# Trajectory container helpers (reference parity: trajectory.hh:16-45,
# quadrotor_model.cc:258-263 — equality and stream formatting)
# ---------------------------------------------------------------------------


def trajectory_point(traj: Trajectory, i):
    """(time, State, control) triple at stage i — the reference's
    TrajectoryPoint (trajectory.hh:10-14) as a tuple view."""
    state = jax.tree.map(lambda leaf: leaf[..., i, :], traj.states)
    return traj.times[..., i], state, traj.controls[..., i, :]


def trajectory_equal(a: Trajectory, b: Trajectory, atol: float = 0.0) -> bool:
    """Elementwise equality of two trajectories (trajectory.hh:16-21
    semantics; atol > 0 gives an approximate variant). Host-side."""
    import numpy as np

    leaves_a, treedef_a = jax.tree_util.tree_flatten(a)
    leaves_b, treedef_b = jax.tree_util.tree_flatten(b)
    if treedef_a != treedef_b:
        return False
    for la, lb in zip(leaves_a, leaves_b):
        if la.shape != lb.shape:
            return False
        if atol == 0.0:
            if not np.array_equal(np.asarray(la), np.asarray(lb)):
                return False
        elif not np.allclose(np.asarray(la), np.asarray(lb), atol=atol):
            return False
    return True


def format_trajectory(traj: Trajectory, max_points: int = 5) -> str:
    """Human-readable summary (operator<< equivalent, trajectory.hh:26-45)."""
    import numpy as np

    n = traj.horizon
    lines = [f"Trajectory(horizon={n}, batch={traj.controls.shape[:-2]})"]
    show = min(n, max_points)
    times = np.asarray(traj.times)
    trans = np.asarray(traj.states.pose.trans)
    quat = np.asarray(traj.states.pose.quat)
    controls = np.asarray(traj.controls)
    for i in range(show):
        lines.append(
            f"  [{i}] t={times[..., i]} trans={trans[..., i, :]} "
            f"quat={quat[..., i, :]} u={controls[..., i, :]}"
        )
    if n > show:
        lines.append(f"  ... ({n - show} more)")
    return "\n".join(lines)
