"""Pallas TPU kernels: fused backward (Riccati) pass and rollout+cost.

Layout convention: inside kernels the scenario batch lives in the LANE
(minor-most) dimension — vectors are (d, B), matrices (r, c, B) — so every
small-matrix op vectorizes across 128 scenario lanes on the VPU instead of
padding 12x12 operands onto (8,128) tiles (which inflates HBM traffic ~14x
and is why the pure-XLA path is latency-bound).
"""

from . import lanes  # noqa: F401
from .backward import backward_pass_fused  # noqa: F401
from .fddp import solve_fddp_fused  # noqa: F401
from .rollout import rollout_cost_fused  # noqa: F401
from .stream import solve_fused_streamed  # noqa: F401
from .stream_fddp import solve_fddp_streamed  # noqa: F401
