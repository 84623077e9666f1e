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


def _ranges(adv: Optional[BoundingBox], lo_fallback, hi_fallback, eps=1e-8):
    lo = jnp.asarray(adv.lo) if adv is not None else lo_fallback
    hi = jnp.asarray(adv.hi) if adv is not None else hi_fallback
    S = hi - lo
    S = jnp.where(S < eps, jnp.maximum(jnp.abs(hi), 1.0), S)
    return S, lo


def compute_scaling(
    pbm: TrajectoryProblem, x_guess, u_guess, p_guess
) -> Scaling:
    """Build the diagonal scaling from advice, falling back to guess ranges
    (reference scp.jl:376-517, advice path problem.jl:263-283)."""
    pad = 0.0
    xlo = jnp.min(x_guess, axis=0) - pad
    xhi = jnp.max(x_guess, axis=0) + pad
    ulo = jnp.min(u_guess, axis=0) - pad
    uhi = jnp.max(u_guess, axis=0) + pad
    Sx, cx = _ranges(pbm.xrg, xlo, xhi)
    Su, cu = _ranges(pbm.urg, ulo, uhi)
    Sp, cp = _ranges(pbm.prg, p_guess, p_guess)
    return Scaling(Sx=Sx, cx=cx, Su=Su, cu=cu, Sp=Sp, cp=cp)
