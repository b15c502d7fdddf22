"""Float64 NumPy oracle — independent re-derivation of the reference
semantics used as the correctness golden (see BASELINE.md)."""
