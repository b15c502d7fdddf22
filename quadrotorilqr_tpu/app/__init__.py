"""Application layer: workloads, demo driver, plotting."""
