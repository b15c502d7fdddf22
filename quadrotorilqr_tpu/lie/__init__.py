"""Lie-group core: SO(3) quaternions and SE(3) rigid transforms (manif conventions)."""

from . import se3, so3
from .se3 import SE3

__all__ = ["so3", "se3", "SE3"]
