"""Receding-horizon MPC on top of the iLQR engine (BASELINE.json config 4).

The reference has no MPC mode — its driver solves one fixed-horizon problem
(quadrotor_ilqr.py:294-306). This module adds the production pattern the
benchmark targets: warm-started H-step solves at a fixed control rate, the
whole control loop compiled as ONE `lax.scan` so there is no per-step host
round trip (a per-step dispatch would cost ~25 ms through a TPU tunnel and
cap the rate at 40 Hz regardless of compute).

Per control step k (batched over B scenarios):
  1. window the desired trajectory to [k, k + H),
  2. solve iLQR from the current plant state, warm-started with the previous
     solution shifted by one stage (last control repeated),
  3. apply the first optimized control to the plant (Euler step),
  4. carry the shifted solution as the next warm start.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..costs.quadratic import QuadraticTrackingCost
from ..models import quadrotor as qm
from ..models.quadrotor import QuadrotorParams, State
from ..solver.batched import solve_batch_fused, solve_batch_latency
from ..solver.ilqr import Trajectory
from ..solver.options import ILQROptions
from . import workloads  # noqa: F401  (re-exported convenience)


def _window(tree, k, h, axis=1):
    """dynamic_slice of length h at offset k along `axis` of every leaf."""
    return jax.tree.map(
        lambda a: jax.lax.dynamic_slice_in_dim(a, k, h, axis=axis), tree
    )


def _shift(traj: Trajectory) -> Trajectory:
    """Shift one stage forward, repeating the final stage (warm start)."""

    def shift_leaf(a):
        return jnp.concatenate([a[:, 1:], a[:, -1:]], axis=1)

    return Trajectory(
        times=traj.times,
        states=jax.tree.map(shift_leaf, traj.states),
        controls=shift_leaf(traj.controls),
    )


def _set_first_state(states: State, x: State) -> State:
    return jax.tree.map(lambda buf, v: buf.at[:, 0, :].set(v), states, x)


def mpc_warm_start(desired_full: Trajectory, x0: State, horizon: int) -> Trajectory:
    """Initial warm start: the first horizon window of the desired
    trajectory tiled over the batch, with the plant state at stage 0 (the
    solver's trip-0 rollout makes it feasible)."""
    batch = x0.vel.shape[0]
    first_win = _window(
        jax.tree.map(lambda a: a[None], desired_full), 0, horizon
    )
    warm0 = Trajectory(
        times=jnp.broadcast_to(first_win.times, (batch, horizon)),
        states=jax.tree.map(
            lambda a: jnp.broadcast_to(a, (batch,) + a.shape[1:]),
            first_win.states,
        ),
        controls=jnp.broadcast_to(first_win.controls, (batch, horizon, 4)),
    )
    return Trajectory(
        times=warm0.times,
        states=_set_first_state(warm0.states, x0),
        controls=warm0.controls,
    )


def _mpc_step_impl(
    params, q_weight, r_weight, desired_full, x, warm, k,
    horizon, dt_s, options, interpret, latency_kernel=False,
    stage_weights=None, limits=None, solver="ilqr", fddp_options=None,
    plant_params=None,
):
    """One receding-horizon step (shared by the scanned loop and the
    host-driven single-step path): window targets, warm-started solve,
    apply first control, shift the solution. `latency_kernel=True` runs the
    solve as ONE whole-solve Pallas program (kernels/solve.py) — fewer
    launches per step for small fleets. `stage_weights` ((horizon,)) weights
    the window's stage costs — the standard MPC terminal-emphasis pattern
    (w = [1..1, w_T]); runs at kernel speed (costs/quadratic.py).
    `limits=(lo, hi)` enforces rotor saturation exactly (box-QP stage +
    clamped rollouts inside the kernels); APPLIED controls then respect the
    box by construction. `solver="fddp"` swaps in the robust
    multiple-shooting kernel (solver/batched.solve_batch_fddp) — for
    aggressive disturbance recovery where the exact loop's trip-0 rollout
    can diverge; `fddp_options` tunes it (f32 runs need gap_tol~1e-5,
    solver/fddp.FDDPOptions)."""
    win = _window(desired_full, k, horizon, axis=0)
    cost_k = QuadraticTrackingCost(
        Q=q_weight,
        R=r_weight,
        desired_states=win.states,
        desired_controls=win.controls,
        stage_weights=stage_weights,
    )
    init_traj = Trajectory(
        times=warm.times,
        states=_set_first_state(warm.states, x),
        controls=warm.controls,
    )
    if solver == "fddp":
        from ..solver.batched import solve_batch_fddp

        res = solve_batch_fddp(
            params, cost_k, init_traj, dt_s, options,
            fddp_options=fddp_options, interpret=interpret, limits=limits,
        )
    elif solver == "ilqr":
        engine = solve_batch_latency if latency_kernel else solve_batch_fused
        res = engine(
            params, cost_k, init_traj, dt_s, options, interpret=interpret,
            limits=limits,
        )
    else:
        # fail loudly: a typo (or solve_batch's "fddp-ddp") silently running
        # the divergence-prone exact loop defeats the robust-mode request
        raise ValueError(f"unknown MPC solver {solver!r} (use 'ilqr'/'fddp')")
    u0 = res.trajectory.controls[:, 0]
    # the PLANT may differ from the controller's model (plant_params:
    # parameter mismatch — the robustness condition a deployed MPC loop
    # actually runs under; None = exact model)
    x_next = qm.discrete_dynamics(
        params if plant_params is None else plant_params, x, u0, dt_s
    )
    warm_next = _shift(res.trajectory)
    return x_next, warm_next, u0, res


@partial(
    jax.jit,
    static_argnames=(
        "horizon", "dt_s", "options", "interpret", "latency_kernel",
        "solver", "fddp_options",
    ),
)
def mpc_step(
    params,
    q_weight,
    r_weight,
    desired_full: Trajectory,
    x: State,
    warm: Trajectory,
    k,
    horizon: int,
    dt_s: float,
    options: ILQROptions = ILQROptions(),
    interpret: bool = False,
    latency_kernel: bool = False,
    stage_weights=None,
    limits=None,
    solver: str = "ilqr",
    fddp_options=None,
):
    """One compiled MPC step for HOST-DRIVEN deployment loops, where the tail
    of the per-dispatch latency distribution (p99/max vs the control period)
    is the number that certifies a control rate. Returns
    (x_next, warm_next, u0) — keep x/warm on device, read only u0 back.
    """
    x_next, warm_next, u0, _ = _mpc_step_impl(
        params, q_weight, r_weight, desired_full, x, warm, k,
        horizon, dt_s, options, interpret, latency_kernel, stage_weights,
        limits, solver, fddp_options,
    )
    return x_next, warm_next, u0


@partial(
    jax.jit,
    static_argnames=(
        "n_steps", "horizon", "dt_s", "options", "interpret",
        "latency_kernel", "solver", "fddp_options",
    ),
)
def run_mpc(
    params: QuadrotorParams,
    q_weight,
    r_weight,
    desired_full: Trajectory,
    x0: State,
    n_steps: int,
    horizon: int,
    dt_s: float,
    options: ILQROptions = ILQROptions(),
    interpret: bool = False,
    latency_kernel: bool = False,
    stage_weights=None,
    limits=None,
    solver: str = "ilqr",
    fddp_options=None,
    plant_params=None,
    warm0=None,
):
    """Run `n_steps` of warm-started receding-horizon control.

    desired_full leaves are UNBATCHED (N_full >= n_steps + horizon stages,
    leading axis = time); x0 leaves are (B, ...) with B a multiple of 128.
    Returns a dict of stacked outputs: applied controls "u" (B, K, 4), the
    plant translation history "x_trans" (B, K, 3), per-step solver
    "iterations"/"cost"/"status" (B, K), the final full plant state
    "x_final" (State with (B, ...) leaves), and "warm_final" — the shifted
    solution, so CHUNKED drivers (benchmarks/mpc_device_loop.py: K ticks
    per launch, one host read per chunk) resume the loop exactly.
    `plant_params` simulates a model-mismatched plant (see _mpc_step_impl);
    `warm0` (a prior "warm_final") overrides the cold warm start.

    NOTE: `k` counts from 0 within ONE call — chunked drivers window the
    desired trajectory per chunk (pass desired_full[k0:k0+n_steps+horizon]).
    """
    batch = x0.vel.shape[0]
    dtype = x0.vel.dtype
    n_full = desired_full.controls.shape[0]
    if n_full < n_steps + horizon:
        # dynamic_slice would clamp silently, making the last windows track
        # stale targets — refuse instead.
        raise ValueError(
            f"desired trajectory has {n_full} stages; receding over "
            f"{n_steps} steps with horizon {horizon} needs >= {n_steps + horizon}"
        )

    if warm0 is None:
        warm0 = mpc_warm_start(desired_full, x0, horizon)

    def step(carry, k):
        x, warm = carry
        x_next, warm_next, u0, res = _mpc_step_impl(
            params, q_weight, r_weight, desired_full, x, warm, k,
            horizon, dt_s, options, interpret, latency_kernel, stage_weights,
            limits, solver, fddp_options, plant_params,
        )
        out = {
            "u": u0,
            "x_trans": x.pose.trans,
            "iterations": res.iterations,
            "cost": res.cost,
            "status": res.status,
        }
        return (x_next, warm_next), out

    (x_final, warm_final), outs = jax.lax.scan(
        step, (x0, warm0), jnp.arange(n_steps, dtype=jnp.int32)
    )
    # scan stacks along axis 0 (time); move batch first
    outs = jax.tree.map(lambda a: jnp.moveaxis(a, 0, 1), outs)
    outs["x_final"] = x_final
    outs["warm_final"] = warm_final
    return outs
