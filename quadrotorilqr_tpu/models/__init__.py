"""Dynamics models. The solver is model-generic: anything exposing the
quadrotor module's function signatures (discrete_dynamics[_jacobians],
minus[_jacobians], add) plugs in."""

from . import quadrotor
from .quadrotor import QuadrotorParams, State

__all__ = ["quadrotor", "QuadrotorParams", "State"]
