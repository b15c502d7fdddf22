"""Lane-model descriptors: the model protocol of the fused Pallas kernels.

The XLA solver layer is model-generic via Python modules implementing
(discrete_dynamics, discrete_dynamics_jacobians, minus) — the TPU-native
equivalent of the reference's `template <class ModelT>` (ilqr.hh:25-32).
This module gives the KERNEL engines the same genericity in lane layout.

Every supported model is an SE(3) rigid body with an affine
control-to-acceleration map:

    accel(x, u) = [-g R^T e_z ; -I^-1 (w x I w)] + B_u(params) @ u

so the discrete dynamics Jacobian j_x has the SAME block structure for every
model (backward._stage_jx_blocks — the state coupling is the rigid body, not
the actuation; compare quadrotor_model.cc:84-111 with models/se3_wrench.py),
and the whole backward Riccati stage (backward._riccati_stage) is shared.
Models differ only in:

  * ``u_dim`` — control dimension (quadrotor 4 rotors, wrench 6 DoF);
  * ``ju`` + ``ju_lo`` — the stage-constant discrete control Jacobian
    j_u = dt * j_cont_u as a (12, u_dim) lane tile and the index of its
    first nonzero state row (8 for the quadrotor: body-z thrust + angular
    accel; 6 for the wrench: full actuation). Riccati contractions run over
    rows ju_lo:12 only — bit-exact, the dropped products are structural
    zeros;
  * ``dynamics_step`` — the lane-layout Lie-Euler step, evaluating the
    control->accel map the same way the model's XLA module does.

Kernel param operands are a FIXED six-tuple of lane tiles
(g, m_inv, ju, extra, inertia, inertia_inv) so every kernel keeps a fixed
arity; ``extra`` is a per-model slot (quadrotor: I^-1 @ moment_arms for the
rollout's rotor map; wrench: an unused (1, 1) placeholder). Shared params
are single broadcast tiles the kernel grid re-reads; per-scenario params
(ALL leaves carrying a leading batch dim) are per-lane (d..., B) tensors —
the same contract as backward._prep_params.
"""

from __future__ import annotations

import jax.numpy as jnp


class LaneModel:
    """Static kernel-model descriptor (hashable module-level singleton, so
    it can thread through jit/pallas as a static argument).

    `has_drag=True` marks the diagonal velocity-drag extension
    (models/quadrotor_drag.py): `extra` carries two additional columns
    [drag_lin/m | drag_ang] after the model's own operand, and
    `drag_rows(extra)` slices them for backward._stage_jx_blocks — the
    j_x template's velocity blocks gain I3 - dt·diag(dl) and
    -I⁻¹ diag(da) (both stage-constant), everything else is shared."""

    def __init__(self, name, u_dim, ju_lo, prep_params, dynamics_step,
                 has_drag=False, substeps=1, base=None):
        self.name = name
        self.u_dim = u_dim
        self.ju_lo = ju_lo
        self.prep_params = prep_params
        self.dynamics_step = dynamics_step
        self.has_drag = has_drag
        # substepped integration (models/integrators.substepped at kernel
        # speed): the stage map is `substeps` chained Lie-Euler steps of
        # dt/substeps; `base` is the single-step LaneModel whose
        # dynamics_step the Riccati chain rolls (backward._riccati_stage
        # substeps/chain)
        self.substeps = substeps
        self.base = base

    def drag_rows(self, extra):
        """(dl, da) lane rows from the packed extra operand, or None for
        drag-free families (the block helpers then skip the multiplies —
        bit-identical to before the extension)."""
        if not self.has_drag:
            return None
        u = self.u_dim
        return (extra[:, u], extra[:, u + 1])

    def __repr__(self):
        return f"LaneModel({self.name})"


# ---------------------------------------------------------------------------
# quadrotor (models/quadrotor.py in lane layout)
# ---------------------------------------------------------------------------


def _quadrotor_prep_params(params, dt_s, dtype):
    """(g, m_inv, ju, extra=iinv_ma, inertia, inertia_inv, batched)."""
    from .backward import _prep_params

    g, ju, iinv_ma, inertia, inertia_inv, m_inv, batched = _prep_params(
        params, dt_s, dtype
    )
    return g, m_inv, ju, iinv_ma, inertia, inertia_inv, batched


def _quadrotor_dynamics_step(
    dt, g, m_inv, extra, i_l, iinv_l, ez, quat, trans, vel, u
):
    from .rollout import _dynamics_step

    return _dynamics_step(
        dt, g, m_inv, extra, i_l, iinv_l, ez, quat, trans, vel, u
    )


QUADROTOR = LaneModel(
    name="quadrotor",
    u_dim=4,
    ju_lo=8,
    prep_params=_quadrotor_prep_params,
    dynamics_step=_quadrotor_dynamics_step,
)


# ---------------------------------------------------------------------------
# fully-actuated SE(3) body wrench (models/se3_wrench.py in lane layout)
# ---------------------------------------------------------------------------


def _wrench_prep_params(params, dt_s, dtype):
    """(g, m_inv, ju, extra=(1,1) placeholder, inertia, inertia_inv,
    batched). j_u = dt * j_cont_u: rows 6:9 = (dt/m) I3 into force columns
    0:3, rows 9:12 = dt I^-1 into torque columns 3:6
    (models/se3_wrench.py continuous_dynamics_jacobians; the Euler chain
    rule keeps pose rows zero exactly as for the quadrotor)."""
    from ..ops.linalg import chol_solve_small
    from .backward import _bcast_tile, _to_lanes

    batched = jnp.ndim(params.mass_kg) >= 1
    inertia = jnp.asarray(params.inertia, dtype)
    inertia_inv = chol_solve_small(inertia, jnp.eye(3, dtype=dtype))
    mass = jnp.asarray(params.mass_kg, dtype)
    g = jnp.asarray(params.g_mpss, dtype)
    eye3 = jnp.eye(3, dtype=dtype)
    ju = jnp.zeros(jnp.shape(mass) + (12, 6), dtype)
    ju = ju.at[..., 6:9, 0:3].set(
        (dt_s / mass)[..., None, None] * eye3 if batched else (dt_s / mass) * eye3
    )
    ju = ju.at[..., 9:12, 3:6].set(dt_s * inertia_inv)
    if batched:
        b = mass.shape[0]
        return (
            _to_lanes(g.reshape(-1, 1, 1)),
            _to_lanes((1.0 / mass).reshape(-1, 1, 1)),
            _to_lanes(ju),
            _to_lanes(jnp.zeros((b, 1, 1), dtype)),
            _to_lanes(jnp.broadcast_to(inertia, (b, 3, 3))),
            _to_lanes(jnp.broadcast_to(inertia_inv, (b, 3, 3))),
            True,
        )
    return (
        _bcast_tile(g.reshape(1, 1), dtype),
        _bcast_tile((1.0 / mass).reshape(1, 1), dtype),
        _bcast_tile(ju, dtype),
        _bcast_tile(jnp.zeros((1, 1), dtype), dtype),
        _bcast_tile(inertia, dtype),
        _bcast_tile(inertia_inv, dtype),
        False,
    )


def _wrench_dynamics_step(
    dt, g, m_inv, extra, i_l, iinv_l, ez, quat, trans, vel, u
):
    """Lie-Euler step of the wrench dynamics in lane layout
    (models/se3_wrench.py continuous_dynamics + the shared Euler step):
    u = [f_body (3), tau_body (3)]."""
    from . import lanes as L

    r_t_ez = L.quat_rotate(L.quat_conjugate(quat), ez)
    acc_lin = -g * r_t_ez + m_inv * u[0:3]
    omega = vel[3:6]
    i_omega = L.matvec(i_l, omega)
    acc_ang = L.matvec(iinv_l, u[3:6] - L.cross(omega, i_omega))
    tau = dt * vel
    qe, te = L.se3_exp(tau)
    quat_next, trans_next = L.se3_multiply(quat, trans, qe, te)
    vel_next = vel + dt * jnp.concatenate([acc_lin, acc_ang], axis=0)
    return quat_next, trans_next, vel_next


SE3_WRENCH = LaneModel(
    name="se3_wrench",
    u_dim=6,
    ju_lo=6,
    prep_params=_wrench_prep_params,
    dynamics_step=_wrench_dynamics_step,
)


# ---------------------------------------------------------------------------
# generic multirotor (models/multirotor.py in lane layout): one LaneModel per
# rotor count R, built on demand and memoized (LaneModels must be hashable
# singletons to thread through jit as static arguments). The lane dynamics
# step is the QUADROTOR one — it is already rotor-count generic (thrust sum
# + extra=(3,R) moment-map matvec derive their shapes from the operands).
# ---------------------------------------------------------------------------

_MULTIROTOR_CACHE = {}


def _multirotor_prep_params(params, dt_s, dtype):
    """(g, m_inv, ju, extra=iinv_ma, inertia, inertia_inv, batched) for a
    MultirotorParams — the quadrotor layout with the generic moment map
    (models/multirotor.moment_map): j_u row 8 = dt/m, rows 9:12 = dt I^-1 MA."""
    from ..models.multirotor import moment_map
    from ..ops.linalg import chol_solve_small
    from .backward import _bcast_tile, _to_lanes

    batched = jnp.ndim(params.mass_kg) >= 1
    inertia = jnp.asarray(params.inertia, dtype)
    inertia_inv = chol_solve_small(inertia, jnp.eye(3, dtype=dtype))
    ma = jnp.asarray(moment_map(params), dtype)
    iinv_ma = inertia_inv @ ma
    mass = jnp.asarray(params.mass_kg, dtype)
    g = jnp.asarray(params.g_mpss, dtype)
    r = ma.shape[-1]
    ju = jnp.zeros(jnp.shape(mass) + (12, r), dtype)
    ju = ju.at[..., 8, :].set(
        (dt_s / mass)[..., None] if batched else dt_s / mass
    )
    ju = ju.at[..., 9:12, :].set(dt_s * iinv_ma)
    if batched:
        b = mass.shape[0]
        return (
            _to_lanes(g.reshape(-1, 1, 1)),
            _to_lanes((1.0 / mass).reshape(-1, 1, 1)),
            _to_lanes(ju),
            _to_lanes(jnp.broadcast_to(iinv_ma, (b, 3, r))),
            _to_lanes(jnp.broadcast_to(inertia, (b, 3, 3))),
            _to_lanes(jnp.broadcast_to(inertia_inv, (b, 3, 3))),
            True,
        )
    return (
        _bcast_tile(g.reshape(1, 1), dtype),
        _bcast_tile((1.0 / mass).reshape(1, 1), dtype),
        _bcast_tile(ju, dtype),
        _bcast_tile(iinv_ma, dtype),
        _bcast_tile(inertia, dtype),
        _bcast_tile(inertia_inv, dtype),
        False,
    )


def multirotor_lane_model(n_rotors: int) -> LaneModel:
    """The LaneModel for an R-rotor airframe (memoized per R)."""
    lm = _MULTIROTOR_CACHE.get(n_rotors)
    if lm is None:
        lm = LaneModel(
            name=f"multirotor{n_rotors}",
            u_dim=n_rotors,
            ju_lo=8,
            prep_params=_multirotor_prep_params,
            dynamics_step=_quadrotor_dynamics_step,
        )
        _MULTIROTOR_CACHE[n_rotors] = lm
    return lm


# ---------------------------------------------------------------------------
# quadrotor with body-frame diagonal velocity drag
# (models/quadrotor_drag.py in lane layout)
# ---------------------------------------------------------------------------


def _drag_quadrotor_prep_params(params, dt_s, dtype):
    """Quadrotor operands with extra = [I⁻¹MA | drag_lin/m | drag_ang]
    ((3, u+2) core). j_u is unchanged (the control map is drag-free)."""
    from ..models.quadrotor import moment_arms
    from ..ops.linalg import chol_solve_small
    from .backward import _bcast_tile, _to_lanes

    batched = jnp.ndim(params.mass_kg) >= 1
    inertia = jnp.asarray(params.inertia, dtype)
    inertia_inv = chol_solve_small(inertia, jnp.eye(3, dtype=dtype))
    ma = jnp.asarray(moment_arms(params.dragless()), dtype)
    iinv_ma = inertia_inv @ ma
    mass = jnp.asarray(params.mass_kg, dtype)
    g = jnp.asarray(params.g_mpss, dtype)
    dl = jnp.asarray(params.drag_lin, dtype) / mass[..., None]
    da = jnp.asarray(params.drag_ang, dtype)
    ju = jnp.zeros(jnp.shape(mass) + (12, 4), dtype)
    ju = ju.at[..., 8, :].set(
        (dt_s / mass)[..., None] if batched else dt_s / mass
    )
    ju = ju.at[..., 9:12, :].set(dt_s * iinv_ma)
    if batched:
        b = mass.shape[0]
        extra = jnp.concatenate(
            [
                jnp.broadcast_to(iinv_ma, (b, 3, 4)),
                jnp.broadcast_to(dl[..., None], (b, 3, 1)),
                jnp.broadcast_to(da[..., None], (b, 3, 1)),
            ],
            axis=-1,
        )
        return (
            _to_lanes(g.reshape(-1, 1, 1)),
            _to_lanes((1.0 / mass).reshape(-1, 1, 1)),
            _to_lanes(ju),
            _to_lanes(extra),
            _to_lanes(jnp.broadcast_to(inertia, (b, 3, 3))),
            _to_lanes(jnp.broadcast_to(inertia_inv, (b, 3, 3))),
            True,
        )
    extra = jnp.concatenate(
        [iinv_ma, dl[..., None], da[..., None]], axis=-1
    )
    return (
        _bcast_tile(g.reshape(1, 1), dtype),
        _bcast_tile((1.0 / mass).reshape(1, 1), dtype),
        _bcast_tile(ju, dtype),
        _bcast_tile(extra, dtype),
        _bcast_tile(inertia, dtype),
        _bcast_tile(inertia_inv, dtype),
        False,
    )


def _drag_quadrotor_dynamics_step(
    dt, g, m_inv, extra, i_l, iinv_l, ez, quat, trans, vel, u
):
    """Lie-Euler step with diagonal body drag in lane layout
    (models/quadrotor_drag.continuous_dynamics + the shared Euler step)."""
    from . import lanes as L

    u_dim = u.shape[0]
    iinv_ma = extra[:, 0:u_dim]
    dl = extra[:, u_dim]  # (3, B) drag_lin/m
    da = extra[:, u_dim + 1]  # (3, B) drag_ang
    r_t_ez = L.quat_rotate(L.quat_conjugate(quat), ez)
    v_lin = vel[0:3]
    acc_lin = (
        -g * r_t_ez
        + (jnp.sum(u, axis=0, keepdims=True) * m_inv) * ez
        - dl * v_lin
    )
    omega = vel[3:6]
    i_omega = L.matvec(i_l, omega)
    acc_ang = L.matvec(iinv_ma, u) - L.matvec(
        iinv_l, L.cross(omega, i_omega) + da * omega
    )
    tau = dt * vel
    qe, te = L.se3_exp(tau)
    quat_next, trans_next = L.se3_multiply(quat, trans, qe, te)
    vel_next = vel + dt * jnp.concatenate([acc_lin, acc_ang], axis=0)
    return quat_next, trans_next, vel_next


DRAG_QUADROTOR = LaneModel(
    name="quadrotor_drag",
    u_dim=4,
    ju_lo=8,
    prep_params=_drag_quadrotor_prep_params,
    dynamics_step=_drag_quadrotor_dynamics_step,
    has_drag=True,
)


_SUBSTEP_CACHE = {}


def substepped_lane_model(base: LaneModel, k: int) -> LaneModel:
    """The k-substep variant of a LaneModel (memoized; hashable static
    arg) — the kernel counterpart of models/integrators.substepped. The
    dynamics step chains k base steps of dt/k; params prep at dt/k makes
    the `ju` operand the per-SUBSTEP control Jacobian the Riccati chain
    accumulates (backward._riccati_stage)."""
    if k == 1:
        return base
    key = (base.name, int(k))
    lm = _SUBSTEP_CACHE.get(key)
    if lm is not None:
        return lm

    def dynamics_step(dt, g, m_inv, extra, i_l, iinv_l, ez, quat, trans,
                      vel, u):
        h = dt / k
        for _ in range(k):
            quat, trans, vel = base.dynamics_step(
                h, g, m_inv, extra, i_l, iinv_l, ez, quat, trans, vel, u
            )
        return quat, trans, vel

    lm = LaneModel(
        name=f"{base.name}_sub{k}",
        u_dim=base.u_dim,
        ju_lo=base.ju_lo,
        prep_params=lambda params, dt_s, dtype: base.prep_params(
            params, dt_s / k, dtype
        ),
        dynamics_step=dynamics_step,
        has_drag=base.has_drag,
        substeps=int(k),
        base=base,
    )
    _SUBSTEP_CACHE[key] = lm
    return lm


def lane_model_for(params, model=None):
    """Resolve the LaneModel for a params pytree (or an explicit XLA model
    module / LaneModel passed as `model=`). Substepped XLA wrappers
    (models/integrators.substepped) resolve to the substepped variant of
    their base family's LaneModel."""
    if isinstance(model, LaneModel):
        return model
    from ..models.integrators import _Substepped

    if isinstance(model, _Substepped):
        return substepped_lane_model(
            lane_model_for(params, model.base), model.k
        )
    if model is not None:
        name = getattr(model, "__name__", "")
        if name.endswith("quadrotor_drag"):
            return DRAG_QUADROTOR
        if name.endswith("se3_wrench"):
            return SE3_WRENCH
        if name.endswith("multirotor"):
            return multirotor_lane_model(params.rotor_positions_m.shape[-2])
        if name.endswith("quadrotor"):
            return QUADROTOR
        raise TypeError(f"no lane model for model module {name!r}")
    from ..models.multirotor import MultirotorParams
    from ..models.quadrotor import QuadrotorParams
    from ..models.quadrotor_drag import DragQuadrotorParams
    from ..models.se3_wrench import WrenchParams

    if isinstance(params, QuadrotorParams):
        return QUADROTOR
    if isinstance(params, DragQuadrotorParams):
        return DRAG_QUADROTOR
    if isinstance(params, WrenchParams):
        return SE3_WRENCH
    if isinstance(params, MultirotorParams):
        return multirotor_lane_model(params.rotor_positions_m.shape[-2])
    raise TypeError(f"no lane model for params type {type(params).__name__}")
