"""Higher-order integration wrappers: substepped Lie-Euler and chart RK4.

The reference discretizes with ONE Euler step per stage
(/root/reference/src/quadrotor_model.cc:266-277); at coarse dt that is the
direct cause of the aggressive-scenario rollout divergence solve_fddp
exists to rescue (the gyroscopic omega^2 term explodes under a long Euler
step). `substepped(model, k)` turns ANY model module of the open protocol
into one whose stage map is k chained Euler substeps of dt/k:

    f_k(x, u, dt) = e(e(...e(x, u, dt/k)...), u, dt/k)      (k times)

with the EXACT chain-ruled Jacobians (products of the base model's analytic
per-substep Jacobians — no finite differences, no autodiff):

    J_x = J_k ... J_1,     J_u = sum_i  J_k ... J_{i+1} B_i

computed by the recurrence  Jx <- A Jx,  Ju <- A Ju + B  per substep.

`rk4(model)` is the fourth-order counterpart: classical RK4 run on the
EXACT chart ODE at the stage's base point. With the right-plus chart
z(tau) = x (+) tau (pose right-plus + vector vel add — the shared
SE(3) x R^6 state of every model family here), the manifold ODE
dz/dt = (v_body, accel(z, u)) is EXACTLY the vector ODE

    d tau_pose / dt = Jr_SE3^{-1}(tau_pose) @ v_body(z(tau))
    d vel       / dt = accel(z(tau), u)

(the right Jacobian inverse is the exact dexpinv of the chart — no
truncated-commutator RKMK series needed), so classical RK4 on tau in R^12
is genuinely fourth order and x (+) tau_final maps back without error.
Jacobians are EXACT forward-mode autodiff of the Lie-lifted step map
(tau_x, du) -> step(x (+) tau_x, u + du) (-) step(x, u) — the same lifting
solver/ddp.py uses for curvature — i.e. the true derivative of the actual
RK4 composition, not an FD or a lower-order approximation.

Both wrappers satisfy the same module protocol (the reference's
`template <class ModelT>`), so every XLA solver path takes them directly:
`solve(params, cost, traj, dt, model=substepped(quadrotor, 4))` or
`model=rk4(quadrotor)`. Control is held constant across the stage
(zero-order hold — the stage semantics of the reference). The fused
kernels keep their single-step analytic stage (their j_x block sparsity is
the ONE-Euler-substep structure); use the XLA paths for wrapped models.
Instances are memoized so they are stable hashable jit static arguments.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_CACHE = {}


class _Substepped:
    """Module-like wrapper: k substeps of `base` per discrete stage."""

    def __init__(self, base, k: int):
        if k < 1:
            raise ValueError(f"substeps must be >= 1, got {k}")
        self.base = base
        self.k = k
        self.__name__ = f"{getattr(base, '__name__', 'model')}_sub{k}"
        # group/state ops are integration-independent: delegate verbatim
        self.add = base.add
        self.add_jacobians = base.add_jacobians
        self.minus = base.minus
        self.minus_jacobians = base.minus_jacobians
        self.continuous_dynamics = base.continuous_dynamics
        self.continuous_dynamics_jacobians = base.continuous_dynamics_jacobians

    def discrete_dynamics(self, params, x, u, dt_s):
        h = dt_s / self.k
        for _ in range(self.k):
            x = self.base.discrete_dynamics(params, x, u, h)
        return x

    def discrete_dynamics_jacobians(self, params, x, u, dt_s):
        h = dt_s / self.k
        x, j_x, j_u = self.base.discrete_dynamics_jacobians(params, x, u, h)
        for _ in range(self.k - 1):
            x, a, b = self.base.discrete_dynamics_jacobians(params, x, u, h)
            j_x = a @ j_x
            j_u = a @ j_u + b
        return x, j_x, j_u

    def __repr__(self):
        return f"substepped({getattr(self.base, '__name__', self.base)!r}, {self.k})"


def substepped(model, k: int):
    """The k-substep variant of `model` (memoized; hashable static arg)."""
    key = (id(model), int(k))
    inst = _CACHE.get(key)
    if inst is None:
        inst = _Substepped(model, int(k))
        _CACHE[key] = inst
    return inst


class _RK4:
    """Module-like wrapper: classical RK4 on the exact chart ODE at the
    stage's base point (module docstring). Requires the shared
    SE(3) x R^6 `State` (true for every model family in this package —
    the chart correction Jr_SE3^{-1} is state-layout-specific)."""

    def __init__(self, base):
        self.base = base
        self.__name__ = f"{getattr(base, '__name__', 'model')}_rk4"
        self.add = base.add
        self.add_jacobians = base.add_jacobians
        self.minus = base.minus
        self.minus_jacobians = base.minus_jacobians
        self.continuous_dynamics = base.continuous_dynamics
        self.continuous_dynamics_jacobians = base.continuous_dynamics_jacobians

    def _chart_vf(self, params, x, u, tau):
        """d tau/dt of the right-plus chart at base point x: the pose rate
        is dexpinv = Jr_SE3^{-1}(tau_pose) applied to the body twist; the
        velocity block is the plain acceleration (a vector space)."""
        from ..lie import se3

        z = self.base.add(x, tau)
        xdot = self.base.continuous_dynamics(params, z, u)
        dpose = jnp.einsum(
            "...ij,...j->...i",
            se3.right_jacobian_inv(tau[..., 0:6]),
            xdot[..., 0:6],
        )
        return jnp.concatenate([dpose, xdot[..., 6:12]], axis=-1)

    def discrete_dynamics(self, params, x, u, dt_s):
        vf = lambda tau: self._chart_vf(params, x, u, tau)
        zero = jnp.zeros(u.shape[:-1] + (12,), u.dtype)
        k1 = vf(zero)
        k2 = vf((0.5 * dt_s) * k1)
        k3 = vf((0.5 * dt_s) * k2)
        k4 = vf(dt_s * k3)
        return self.base.add(
            x, (dt_s / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)
        )

    def discrete_dynamics_jacobians(self, params, x, u, dt_s):
        """(x_next, J_x, J_u): exact forward-mode autodiff of the
        Lie-lifted RK4 step (the solver/ddp.py lifting), vmapped over any
        leading batch dims (the solver calls this on the whole (N, ...)
        trajectory at once, solver/ilqr.py:97)."""

        def single(xs, us):
            m = us.shape[-1]
            xn = self.discrete_dynamics(params, xs, us, dt_s)

            def lifted(w):
                z = self.discrete_dynamics(
                    params, self.base.add(xs, w[0:12]), us + w[12:], dt_s
                )
                return self.base.minus(z, xn)

            j = jax.jacfwd(lifted)(jnp.zeros((12 + m,), us.dtype))
            return xn, j[:, 0:12], j[:, 12:]

        f = single
        for _ in range(len(u.shape[:-1])):
            f = jax.vmap(f)
        return f(x, u)

    def __repr__(self):
        return f"rk4({getattr(self.base, '__name__', self.base)!r})"


def rk4(model):
    """The fourth-order chart-RK4 variant of `model` (memoized; hashable
    static arg)."""
    key = ("rk4", id(model))
    inst = _CACHE.get(key)
    if inst is None:
        inst = _RK4(model)
        _CACHE[key] = inst
    return inst
