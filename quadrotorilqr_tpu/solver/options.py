"""Solver options — typed equivalents of the reference's option structs
(/root/reference/src/ilqr_options.hh:4-22, ilqr_options.proto:5-21).

`populate_debug` is a static (Python) bool: when False the debug buffers are
compiled away entirely instead of being carried through the while_loop.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class LineSearchParams:
    step_update: float = 0.5
    desired_reduction_frac: float = 0.5
    max_iters: int = 100


@dataclass(frozen=True)
class ConvergenceCriteria:
    rtol: float = 1e-12
    atol: float = 1e-12
    max_iters: int = 100


@dataclass(frozen=True)
class ILQROptions:
    line_search_params: LineSearchParams = LineSearchParams()
    convergence_criteria: ConvergenceCriteria = ConvergenceCriteria()
    populate_debug: bool = False
    # Levenberg-style Quu regularization: Quu + quu_reg * I before the gain
    # solve. The reference has NO regularization (ilqr.hh:126, parity mode) —
    # keep 0.0 for parity; set small positive (e.g. 1e-6) for robustness on
    # ill-conditioned problems / f32. Not part of the reference proto schema;
    # serialization round-trips drop it (documented in io/proto.py).
    quu_reg: float = 0.0
