"""Cost functions."""

from .quadratic import QuadraticTrackingCost, stage_cost, stage_cost_with_diffs, trajectory_cost

__all__ = ["QuadraticTrackingCost", "stage_cost", "stage_cost_with_diffs", "trajectory_cost"]
