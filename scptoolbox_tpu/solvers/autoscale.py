"""LP-based automatic variable scaling (reference `compute_scaling`,
src/solvers/scp.jl:376-517).

The reference solves TWO ECOS LPs per state/input variable (min and max of
that variable subject to the user's convex X/U sets) to find a bounding box,
then maps each variable onto [0, 1]. Here all 2*(nx + nu) LPs share one
conic template whose objective vector is an input, so the whole sweep is a
single `vmap`-batched IPM solve — the reference's "one ECOS call per
variable per bound" loop (scp.jl:439-481) becomes one device program.

Unbounded directions keep the [0, 1] default box (the reference treats
DUAL_INFEASIBLE the same way, scp.jl:459-481); degenerate (zero-width)
intervals scale by 1 (scp.jl zero_intvl_tol).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from scptoolbox_tpu.config import SCPError, SCPStatus
from scptoolbox_tpu.ops import ipm
from scptoolbox_tpu.ops.cones import ConeSpec
from scptoolbox_tpu.parser.problem import TrajectoryProblem, bind_consts
from scptoolbox_tpu.parser.program import ConicProgram
from scptoolbox_tpu.solvers.scaling import Scaling, compute_scaling


def _bound_box(build_constraints, nvar: int, p_fix, dtype,
               tol: float = 1e-8):
    """min/max each coordinate of a variable z subject to user cone
    constraints: one batched IPM solve over 2*nvar objective vectors.
    Returns (lo, hi, bounded) with bounded[i] False when either direction
    is unbounded (DUAL_INFEASIBLE)."""
    prg = ConicProgram(dtype=dtype)
    z = prg.variable("z", nvar)
    build_constraints(prg, z)
    prg.add_cost(lambda zv: jnp.zeros((), zv.dtype) + 0.0 * jnp.sum(zv),
                 (z,))
    prg.build()
    A, b, c0, _ = prg._assemble({})
    eye = np.eye(nvar)
    # c rows: +e_i (min z_i) then -e_i (max z_i); pad other decision cols
    n = prg.layout.n
    C = np.zeros((2 * nvar, n))
    sl = prg.layout.sl("z")
    C[:nvar, sl] = eye
    C[nvar:, sl] = -eye
    C = jnp.asarray(C, dtype)
    Ab = jnp.broadcast_to(A, (2 * nvar, *A.shape))
    bb = jnp.broadcast_to(b, (2 * nvar, b.shape[0]))
    sols = ipm.solve_batched(Ab, bb, C, prg.spec, tol=tol, max_iter=60)
    zsol = sols.x[:, sl]
    lo = jnp.diagonal(zsol[:nvar])
    hi = jnp.diagonal(zsol[nvar:])
    ok = (sols.status == int(ipm.IPMStatus.OPTIMAL)) | (
        sols.status == int(ipm.IPMStatus.ALMOST_OPTIMAL))
    dinf = sols.status == int(ipm.IPMStatus.DUAL_INFEASIBLE)
    if bool(jnp.any(~ok & ~dinf)):
        raise SCPError(SCPStatus.SCALING_FAILED,
                       "auto-scaling bound LP failed")
    bounded = ok[:nvar] & ok[nvar:]
    return lo, hi, bounded


def autoscale(pbm: TrajectoryProblem, x_guess, u_guess, p_guess,
              t: float = 0.0, k: int = 0,
              dtype=None) -> Scaling:
    """Reference-parity automatic scaling: bound each state/input variable
    by LPs over the user's convex X/U sets at node (t, k), fall back to the
    advice/default scaling for unbounded or unconstrained variables
    (scp.jl:376-517)."""
    base = compute_scaling(pbm, x_guess, u_guess, p_guess)
    dtype = dtype or x_guess.dtype
    t = jnp.asarray(t, dtype)
    k = jnp.asarray(k)
    p_fix = jnp.asarray(p_guess, dtype)
    consts = pbm.consts

    out = {}
    for name, fn, nvar in (("x", pbm.X, pbm.nx), ("u", pbm.U, pbm.nu)):
        if fn is None:
            out[name] = None
            continue
        fn_b = bind_consts(fn, consts)

        def build(prg, z, fn_b=fn_b):
            prg.add_constraint(
                "sets", lambda zv: fn_b(t, k, zv, p_fix), (z,))

        lo, hi, bounded = _bound_box(build, nvar, p_fix, dtype)
        out[name] = (np.asarray(lo), np.asarray(hi), np.asarray(bounded))

    def merge(S0, c0, res):
        if res is None:
            return S0, c0
        lo, hi, bounded = res
        width = hi - lo
        use = bounded & (width > 1e-8)
        S = jnp.where(use, width, S0)
        c = jnp.where(use, lo, c0)
        return S, c

    Sx, cx = merge(base.Sx, base.cx, out["x"])
    Su, cu = merge(base.Su, base.cu, out["u"])
    return Scaling(Sx=Sx, cx=cx, Su=Su, cu=cu, Sp=base.Sp, cp=base.cp)
