"""iLQR solver core."""

from . import constraints
from . import ilqr as ilqr_module
from .auglag import ALOptions, ALSolveResult, solve_auglag
from .constrained import solve_box
from .ddp import backward_pass_ddp
from .diff import solve_implicit
from .fddp import FDDPOptions, solve_fddp
from .ilqr import (
    STATUS_CONVERGED,
    STATUS_LINE_SEARCH_FAILED,
    STATUS_MAX_ITERS,
    CostHistory,
    SolveResult,
    Trajectory,
    backward_pass,
    forward_sim,
    line_search,
    solve,
)
from .options import ConvergenceCriteria, ILQROptions, LineSearchParams

__all__ = [
    "ilqr_module",
    "solve",
    "solve_fddp",
    "FDDPOptions",
    "solve_implicit",
    "solve_box",
    "solve_auglag",
    "ALOptions",
    "ALSolveResult",
    "CostHistory",
    "constraints",
    "backward_pass",
    "backward_pass_ddp",
    "forward_sim",
    "line_search",
    "Trajectory",
    "SolveResult",
    "ILQROptions",
    "LineSearchParams",
    "ConvergenceCriteria",
    "STATUS_CONVERGED",
    "STATUS_MAX_ITERS",
    "STATUS_LINE_SEARCH_FAILED",
]
