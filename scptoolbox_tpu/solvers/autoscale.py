"""LP-based automatic variable scaling (reference `compute_scaling`,
src/solvers/scp.jl:376-517).

The reference solves TWO ECOS LPs per *unadvised* variable: min and max of
that variable over the user's convex sets posted at every node (X for
states and parameters, U for inputs and parameters; scp.jl:404-481), with
(x, u, p) all free decision variables. Bounded directions produce the
scaling box; unbounded directions (DUAL_INFEASIBLE) keep the [0, 1] default
(scp.jl:459-481); degenerate (zero-width) intervals scale by 1
(zero_intvl_tol).

TPU-native differences: all the LPs for one probe set share a single conic
template whose objective vector is the only varying input, so the whole
sweep is ONE `vmap`-batched IPM call instead of the reference's
one-ECOS-process-per-variable-per-bound loop.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from scptoolbox_tpu.config import SCPError, SCPStatus
from scptoolbox_tpu.ops import ipm
from scptoolbox_tpu.parser.problem import TrajectoryProblem, bind_consts
from scptoolbox_tpu.parser.program import ConicProgram
from scptoolbox_tpu.solvers.scaling import (Scaling, compute_scaling,
                                            unadvised_mask)


def _probe_bounds(pbm: TrajectoryProblem, set_fn, z_name: str, nz: int,
                  t_grid: np.ndarray, z_idx: np.ndarray, p_idx: np.ndarray,
                  dtype):
    """Bound selected coordinates of (z, p) subject to `set_fn(t, k, z, p)`
    posted at every node of the time grid (reference scp.jl:449-457 posts
    the set for k = 1:N with shared variables).

    Returns (z_lo, z_hi, z_ok, p_lo, p_hi, p_ok) for the requested index
    arrays; ok is False where either direction was unbounded/unsolved."""
    fn = bind_consts(set_fn, pbm.consts)
    N = len(t_grid)
    prg = ConicProgram(dtype=dtype)
    z = prg.variable("z", nz)
    p = prg.variable("p", pbm.np) if pbm.np > 0 else None

    for k in range(N):
        t_k = jnp.asarray(float(t_grid[k]), dtype)
        k_j = jnp.asarray(k)
        if p is not None:
            prg.add_constraint(
                f"set{k}",
                lambda zv, pv, t_k=t_k, k_j=k_j: fn(t_k, k_j, zv, pv),
                (z, p))
        else:
            p0 = jnp.zeros(0, dtype)
            prg.add_constraint(
                f"set{k}",
                lambda zv, t_k=t_k, k_j=k_j: fn(t_k, k_j, zv, p0),
                (z,))
    prg.add_cost(lambda zv: 0.0 * jnp.sum(zv), (z,))
    prg.build()
    A, b, _, _ = prg._assemble({})

    n = prg.layout.n
    zsl = prg.layout.sl("z")
    psl = prg.layout.sl("p") if p is not None else slice(0, 0)
    cols = np.concatenate([np.arange(n)[zsl][z_idx],
                           np.arange(n)[psl][p_idx]]).astype(int)
    nb = len(cols)
    if nb == 0:
        return None
    C = np.zeros((2 * nb, n))
    C[np.arange(nb), cols] = 1.0       # min z_i
    C[nb + np.arange(nb), cols] = -1.0  # max z_i
    C = jnp.asarray(C, dtype)
    Ab = jnp.broadcast_to(A, (2 * nb, *A.shape))
    bb = jnp.broadcast_to(b, (2 * nb, b.shape[0]))
    sols = ipm.solve_batched(Ab, bb, C, prg.spec, tol=1e-8, max_iter=60)
    vals = jnp.take_along_axis(
        sols.x, jnp.asarray(np.concatenate([cols, cols]))[:, None],
        axis=1)[:, 0]
    status = np.asarray(sols.status)
    ok = np.isin(status, (int(ipm.IPMStatus.OPTIMAL),
                          int(ipm.IPMStatus.ALMOST_OPTIMAL)))
    # reference semantics (scp.jl:471-481): anything except solved or
    # unbounded (DUAL_INFEASIBLE; MAX_ITER is our NUMERICAL_ERROR analog)
    # is a scaling failure, not a silent fallback to the [0, 1] default
    bad = ~ok & ~np.isin(status, (int(ipm.IPMStatus.DUAL_INFEASIBLE),
                                  int(ipm.IPMStatus.MAX_ITER)))
    if bad.any():
        raise SCPError(
            SCPStatus.SCALING_FAILED,
            f"auto-scaling bound LP over {z_name!r} returned status "
            f"{status[bad][0]} (scp.jl:471-481)")
    lo = np.asarray(vals[:nb])
    hi = np.asarray(vals[nb:])
    ok_lo, ok_hi = ok[:nb], ok[nb:]
    nzi = len(z_idx)
    return (lo[:nzi], hi[:nzi], ok_lo[:nzi], ok_hi[:nzi],
            lo[nzi:], hi[nzi:], ok_lo[nzi:], ok_hi[nzi:])


def autoscale(pbm: TrajectoryProblem, x_guess, u_guess, p_guess,
              t_grid: Optional[np.ndarray] = None,
              dtype=None) -> Scaling:
    """Reference-parity scaling: per-index advice wins; unadvised variables
    are bounded by min/max LPs over the user's convex sets at every node
    (states and parameters from X, inputs and parameters from U — with the
    U probe overriding the X probe for parameters both bound, matching the
    reference's sequential overwrite, scp.jl:404-441); unbounded directions
    keep the [0, 1] default (scp.jl:459-481)."""
    base = compute_scaling(pbm, x_guess, u_guess, p_guess)
    dtype = dtype or x_guess.dtype
    if t_grid is None:
        t_grid = np.linspace(0.0, 1.0, x_guess.shape[0])

    x_un = np.flatnonzero(unadvised_mask(pbm.xrg, pbm.nx))
    u_un = np.flatnonzero(unadvised_mask(pbm.urg, pbm.nu))
    p_un = np.flatnonzero(unadvised_mask(pbm.prg, pbm.np))

    bbox = {}  # name -> (idx, lo, hi, ok)
    if pbm.X is not None and (len(x_un) or len(p_un)):
        res = _probe_bounds(pbm, pbm.X, "x", pbm.nx, t_grid, x_un, p_un,
                            dtype)
        if res is not None:
            bbox["x"] = (x_un,) + res[:4]
            bbox["p_from_x"] = (p_un,) + res[4:]
    if pbm.U is not None and (len(u_un) or len(p_un)):
        res = _probe_bounds(pbm, pbm.U, "u", pbm.nu, t_grid, u_un, p_un,
                            dtype)
        if res is not None:
            bbox["u"] = (u_un,) + res[:4]
            bbox["p_from_u"] = (p_un,) + res[4:]

    def merge(S0, c0, entries):
        S = np.asarray(S0).copy()
        c = np.asarray(c0).copy()
        for key in entries:
            if key not in bbox:
                continue
            idx, lo, hi, ok_lo, ok_hi = bbox[key]
            # per-direction merge (scp.jl:459-481): a solved direction's
            # bound is kept even when the other direction is unbounded,
            # which falls back to that side of the [0, 1] default
            lo_m = np.where(ok_lo, lo, 0.0)
            hi_m = np.where(ok_hi, hi, 1.0)
            width = hi_m - lo_m
            use = (ok_lo | ok_hi) & (width > 1e-8)
            sel = idx[use]
            S[sel] = width[use]
            c[sel] = lo_m[use]
        return jnp.asarray(S, dtype), jnp.asarray(c, dtype)

    Sx, cx = merge(base.Sx, base.cx, ["x"])
    Su, cu = merge(base.Su, base.cu, ["u"])
    # U probe last: its bounds overwrite the X probe's (scp.jl def order)
    Sp, cp = merge(base.Sp, base.cp, ["p_from_x", "p_from_u"])
    return Scaling(Sx=Sx, cx=cx, Su=Su, cu=cu, Sp=Sp, cp=cp)


def solver_scaling(pbm: TrajectoryProblem, x_guess, u_guess, p_guess,
                   t_grid: Optional[np.ndarray] = None,
                   dtype=None) -> Scaling:
    """Scaling entry point for the SCP solvers: pure advice when every
    variable is advised (no LP cost), otherwise the reference's LP
    auto-scaling for the unadvised ones (scp.jl:376-517)."""
    any_unadvised = (unadvised_mask(pbm.xrg, pbm.nx).any()
                     or unadvised_mask(pbm.urg, pbm.nu).any()
                     or unadvised_mask(pbm.prg, pbm.np).any())
    if not any_unadvised or (pbm.X is None and pbm.U is None):
        return compute_scaling(pbm, x_guess, u_guess, p_guess)
    return autoscale(pbm, x_guess, u_guess, p_guess, t_grid=t_grid,
                     dtype=dtype)
