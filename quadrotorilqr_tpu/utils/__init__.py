"""Observability utilities: profiling traces, NaN/Inf guards, batch summaries.

The reference has none of this (SURVEY.md §5.1-5.2: no timers, no sanitizers
— single-threaded C++). TPU-native equivalents live here.
"""

from .debug import check_finite, checkify_solve, nonfinite_report  # noqa: F401
from .profiling import time_compiled, trace  # noqa: F401
