"""Dynamics models. The solver is model-generic: anything exposing the
quadrotor module's function signatures (discrete_dynamics[_jacobians],
minus[_jacobians], add) plugs in."""

from . import multirotor, quadrotor, se3_wrench
from .multirotor import MultirotorParams
from .quadrotor import QuadrotorParams, State
from .se3_wrench import WrenchParams

__all__ = [
    "quadrotor",
    "se3_wrench",
    "multirotor",
    "QuadrotorParams",
    "WrenchParams",
    "MultirotorParams",
    "State",
]
