"""Initial-guess projection onto the convex constraints (reference
`correct_convex!`, src/solvers/scp.jl:275-361): minimize the L1 distance (in
scaled variables) from the guess to a point satisfying all convex state and
input sets. Used by SCvx and GuSTO before the first iteration
(scvx.jl:560-568, gusto.jl analog).

Raises SCPError(GUESS_PROJECTION_FAILED) when the projection program does
not solve (reference scp.jl:352-358).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from scptoolbox_tpu.config import SCPError, SCPStatus
from scptoolbox_tpu.ops.ipm import IPMStatus
from scptoolbox_tpu.parser.problem import (TrajectoryProblem,
                                           bind_consts, l1)
from scptoolbox_tpu.parser.program import ConicProgram


def project_convex(pbm: TrajectoryProblem, scaling, x_ref, u_ref, p_ref,
                   t_grid, dtype=None):
    """Project (x_ref, u_ref, p_ref) onto the convex X/U sets; returns the
    corrected (x, u, p)."""
    if pbm.X is None and pbm.U is None:
        return x_ref, u_ref, p_ref
    N = x_ref.shape[0]
    nx, nu, npp = pbm.nx, pbm.nu, pbm.np
    X_fn = bind_consts(pbm.X, pbm.consts)
    U_fn = bind_consts(pbm.U, pbm.consts)

    prg = ConicProgram(dtype=dtype)
    x = prg.variable("x", N, nx)
    u = prg.variable("u", N, nu)
    p = prg.variable("p", npp) if npp > 0 else None
    ex = prg.variable("ex", N)
    eu = prg.variable("eu", N)
    ep = prg.variable("ep") if npp > 0 else None

    iSx = 1.0 / scaling.Sx
    iSu = 1.0 / scaling.Su
    ts = np.asarray(t_grid)
    p_fix = jnp.asarray(p_ref)

    for k in range(N):
        tk = float(ts[k])
        if pbm.X is not None:
            if npp > 0:
                prg.add_constraint(
                    f"X{k}", lambda xv, pv, k=k, tk=tk: X_fn(tk, k, xv[k], pv),
                    (x, p))
            else:
                prg.add_constraint(
                    f"X{k}", lambda xv, k=k, tk=tk: X_fn(tk, k, xv[k], p_fix),
                    (x,))
        if pbm.U is not None:
            if npp > 0:
                prg.add_constraint(
                    f"U{k}", lambda uv, pv, k=k, tk=tk: U_fn(tk, k, uv[k], pv),
                    (u, p))
            else:
                prg.add_constraint(
                    f"U{k}", lambda uv, k=k, tk=tk: U_fn(tk, k, uv[k], p_fix),
                    (u,))
        prg.add_constraint(
            f"ex{k}",
            lambda xv, exv, k=k: [l1(jnp.concatenate(
                [exv[k:k + 1], iSx * (xv[k] - x_ref[k])]))],
            (x, ex))
        prg.add_constraint(
            f"eu{k}",
            lambda uv, euv, k=k: [l1(jnp.concatenate(
                [euv[k:k + 1], iSu * (uv[k] - u_ref[k])]))],
            (u, eu))
    if npp > 0:
        iSp = 1.0 / scaling.Sp
        prg.add_constraint(
            "ep",
            lambda pv, epv: [l1(jnp.concatenate(
                [epv.reshape(1), iSp * (pv - p_ref)]))],
            (p, ep))
        prg.add_cost(lambda exv, euv, epv:
                     jnp.sum(exv) + jnp.sum(euv) + epv, (ex, eu, ep))
    else:
        prg.add_cost(lambda exv, euv: jnp.sum(exv) + jnp.sum(euv), (ex, eu))

    prg.scale(x, jnp.broadcast_to(scaling.Sx, (N, nx)),
              jnp.broadcast_to(scaling.cx, (N, nx)))
    prg.scale(u, jnp.broadcast_to(scaling.Su, (N, nu)),
              jnp.broadcast_to(scaling.cu, (N, nu)))
    if npp > 0:
        prg.scale(p, scaling.Sp, scaling.cp)
    prg.build()
    sol = prg.solve()
    if int(sol.status) not in (int(IPMStatus.OPTIMAL),
                               int(IPMStatus.ALMOST_OPTIMAL)):
        raise SCPError(SCPStatus.GUESS_PROJECTION_FAILED,
                       f"projection IPM status {int(sol.status)}")
    x_out = sol.values["x"]
    u_out = sol.values["u"]
    p_out = sol.values["p"] if npp > 0 else p_ref
    return x_out, u_out, p_out
