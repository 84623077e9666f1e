"""scptoolbox_tpu — a TPU-native sequential convex programming (SCP) trajectory
optimization framework.

Built from scratch for JAX/XLA/Pallas on TPU, with the capabilities of the
SCPToolbox (reference: /root/reference, UW-ACL/SCPToolbox.jl): PTR / SCvx /
GuSTO sequential convex programming algorithms, lossless convexification
(LCvx), a conic-program layer with a native batched primal-dual interior-point
solver (replacing ECOS), FOH/impulse discretization of nonlinear dynamics via
variational state-transition-matrix integration, and the eight bundled
benchmark problems.

Design (not a port):
  * the conic modeling layer is *traced JAX functions* returning affine
    residuals tagged with cones; Jacobians come from jax.jacfwd, and the
    subproblem matrices are extracted by forward-mode linearization.
  * every convex subproblem is solved by a batched homogeneous self-dual
    Mehrotra interior-point method (ops/ipm.py) that vmaps across scenario
    batches and runs entirely on device.
  * discretization is vmap-over-intervals x scan-over-substeps RK4 of the
    variational equations (ops/discretize.py) with no per-step matrix
    inverses (direct integration of the convolution integrals).
  * SCP outer loops are jittable iterations; batched solves shard across a
    jax.sharding.Mesh (parallel/).
"""

from scptoolbox_tpu.config import SCPStatus, SCPError

__version__ = "0.1.0"

__all__ = ["SCPStatus", "SCPError", "__version__"]
