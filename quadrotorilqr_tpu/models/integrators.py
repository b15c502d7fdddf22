"""Substepped integration: k Lie-Euler substeps per stage, exact Jacobians.

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

The wrapper satisfies the same module protocol (the reference's
`template <class ModelT>`), so every XLA solver path takes it directly:
`solve(params, cost, traj, dt, model=substepped(quadrotor, 4))`. Control is
held constant across the substeps (zero-order hold — the stage semantics of
the reference). The fused kernels keep their single-step analytic stage
(their j_x block sparsity is the ONE-substep structure); use the XLA paths
for substepped models. Instances are memoized so they are stable hashable
jit static arguments.
"""

from __future__ import annotations

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
