"""Affine variable scaling x = S x_hat + c (diagonal).

Capability parity with reference src/parser/scaling.jl:38-104 and
src/solvers/scp.jl:376-517 `compute_scaling`: map each state/input/parameter
onto ~[0,1] so the subproblem is well conditioned. The reference solves two
ECOS LPs per variable when no advice is given (scp.jl:439-481); here the
default derives ranges from the user's scaling advice or, failing that, from
the guess trajectory's extent — the batched-LP auto-scaling can be layered on
top with one vmapped IPM call (ops/ipm.solve_batched).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from scptoolbox_tpu.parser.problem import BoundingBox, TrajectoryProblem


class Scaling(NamedTuple):
    """Diagonal affine scaling per variable group: v = S * v_hat + c."""

    Sx: jnp.ndarray
    cx: jnp.ndarray
    Su: jnp.ndarray
    cu: jnp.ndarray
    Sp: jnp.ndarray
    cp: jnp.ndarray

    def x_hat(self, x):
        return (x - self.cx) / self.Sx

    def u_hat(self, u):
        return (u - self.cu) / self.Su

    def p_hat(self, p):
        return (p - self.cp) / self.Sp

    def x(self, x_hat):
        return self.Sx * x_hat + self.cx

    def u(self, u_hat):
        return self.Su * u_hat + self.cu

    def p(self, p_hat):
        return self.Sp * p_hat + self.cp


def _ranges(adv: Optional[BoundingBox], dim, dtype, eps=1e-8):
    """Advice range, else the reference's default [0, 1] bounding box
    (scp.jl:398-403: bbox initialized to [0, 1]; variables whose min/max LPs
    are unbounded keep it), i.e. S = 1, c = 0.

    Per-index advice (reference problem_advise_scale! is per variable index,
    problem.jl:263-283): NaN entries in lo/hi mean "no advice for this index"
    and get the [0, 1] default here (the LP auto-scaling in
    solvers/autoscale.py replaces them with computed bounds when the convex
    sets bound them)."""
    if adv is None:
        return jnp.ones(dim, dtype), jnp.zeros(dim, dtype)
    lo = jnp.asarray(adv.lo, dtype)
    hi = jnp.asarray(adv.hi, dtype)
    unadvised = jnp.isnan(lo) | jnp.isnan(hi)
    lo = jnp.where(unadvised, 0.0, lo)
    hi = jnp.where(unadvised, 1.0, hi)
    S = hi - lo
    # degenerate (zero-width) intervals scale by 1 (scp.jl zero_intvl_tol)
    S = jnp.where(S < eps, 1.0, S)
    return S, lo


def unadvised_mask(adv: Optional[BoundingBox], dim) -> "np.ndarray":
    """Boolean mask of indices lacking scaling advice (advice absent, or NaN
    per-index entries)."""
    import numpy as np

    if adv is None:
        return np.ones(dim, bool)
    lo = np.asarray(adv.lo, float)
    hi = np.asarray(adv.hi, float)
    return np.isnan(lo) | np.isnan(hi)


def compute_scaling(
    pbm: TrajectoryProblem, x_guess, u_guess, p_guess
) -> Scaling:
    """Build the diagonal scaling from advice, with the reference's [0, 1]
    default for unadvised variables (scp.jl:376-517; advice path
    problem.jl:263-283). The reference's per-variable min/max LP auto-scaling
    is available separately (solvers/autoscale.py)."""
    dt = x_guess.dtype
    Sx, cx = _ranges(pbm.xrg, pbm.nx, dt)
    Su, cu = _ranges(pbm.urg, pbm.nu, dt)
    Sp, cp = _ranges(pbm.prg, pbm.np, dt)
    return Scaling(Sx=Sx, cx=cx, Su=Su, cu=cu, Sp=Sp, cp=cp)
