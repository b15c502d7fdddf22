"""Dynamics models. The solver is model-generic: anything exposing the
quadrotor module's function signatures (discrete_dynamics[_jacobians],
minus[_jacobians], add) plugs in."""

from . import integrators, multirotor, quadrotor, quadrotor_drag, se3_wrench
from .multirotor import MultirotorParams
from .quadrotor import QuadrotorParams, State
from .quadrotor_drag import DragQuadrotorParams
from .integrators import rk4, substepped
from .se3_wrench import WrenchParams

__all__ = [
    "quadrotor",
    "se3_wrench",
    "multirotor",
    "quadrotor_drag",
    "integrators",
    "substepped",
    "rk4",
    "QuadrotorParams",
    "WrenchParams",
    "MultirotorParams",
    "DragQuadrotorParams",
    "State",
]
