"""quadrotorilqr_tpu — TPU-native SE(3) quadrotor iLQR trajectory optimization.

A brand-new JAX/XLA/Pallas engine with the capabilities of the C++/Eigen/manif
reference (nitishthatte/QuadrotorILQR): Lie-group quadrotor dynamics with
analytic Jacobians, quadratic tracking cost, the full iLQR loop, plus what the
reference lacks — scenario batching via vmap, multi-chip sharding via
shard_map over a device mesh, and fused Pallas kernels for the hot passes.
"""

__version__ = "0.1.0"
