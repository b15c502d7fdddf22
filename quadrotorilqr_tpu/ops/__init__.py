"""Low-level TPU-friendly ops (small-matrix linear algebra, Pallas kernels)."""

from .linalg import chol_solve_small, chol_solve_vec, cholesky_small  # noqa: F401
