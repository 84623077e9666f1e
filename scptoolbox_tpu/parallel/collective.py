"""Distributed SCP with explicit collectives (SURVEY.md §5 "distributed
communication backend" row; BASELINE.md north star: "psum/all-gather
consensus reductions" over a TPU pod slice).

`solve_batched_collective` runs PTR's batched step under `jax.shard_map`
over the batch axis of a `jax.sharding.Mesh`: each shard owns B/n_dev
scenarios, and the outer SCP iteration is ONE SPMD `lax.while_loop` whose
stopping predicate is a GLOBAL convergence vote — `lax.psum` of the
shard-local active-scenario counts — so the whole fleet stops together the
moment every scenario everywhere has converged (or the budget runs out).
Convergence statistics (feasible count, iteration total) reduce on device
with the same psum machinery instead of a host gather.

Per-scenario subproblem work stays embarrassingly parallel (no
communication inside the IPM); the collectives are the scalar votes and
the final statistics, which ride ICI within a slice and DCN across hosts
unchanged — this file is the single-host-testable core of the multi-host
story, exercised on the virtual CPU mesh by tests/test_collective.py and
by __graft_entry__.dryrun_multichip.

The reference has no distributed runtime at all (SURVEY.md §2.8); its
trials loop re-solves serially (quadrotor/tests.jl:160-202).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from scptoolbox_tpu.config import SCPStatus
from scptoolbox_tpu.ops import ipm
from scptoolbox_tpu.parallel.batch import make_mesh, shard_batch


class CollectiveResult(NamedTuple):
    """Per-scenario outputs + psum-reduced global statistics."""

    x: jnp.ndarray            # (B, N, nx)
    u: jnp.ndarray            # (B, N, nu)
    p: jnp.ndarray            # (B, np)
    J_aug: jnp.ndarray        # (B,)
    feas: jnp.ndarray         # (B,) bool
    status: jnp.ndarray       # (B,) int32 SCPStatus codes
    iters: jnp.ndarray        # (B,) int32
    n_feasible: jnp.ndarray   # () int32, psum across the mesh
    total_iters: jnp.ndarray  # () int32, psum across the mesh
    outer_iters: jnp.ndarray  # () int32: while_loop trips actually taken


def solve_batched_collective(solver, bx, bu, bp, n_iters: int,
                             mesh: Optional[Mesh] = None,
                             axis: str = "batch") -> CollectiveResult:
    """Mesh-distributed batched PTR with a psum'd global convergence vote.

    Unlike `solver.solve_batched` (vmap + fixed-trip scan), the outer loop
    here is a `lax.while_loop` that exits as soon as the psum'd number of
    active scenarios across ALL devices reaches zero — saving whole outer
    iterations for easy batches, not just inner IPM trips."""
    if mesh is None:
        mesh = make_mesh(axis=axis)
    # shard scenarios over ALL mesh axes: on a 2-D (host x batch) mesh
    # (make_mesh_2d) the convergence-vote psum then reduces over ICI
    # within each host AND DCN across hosts in one collective
    axis = (tuple(mesh.axis_names) if len(mesh.axis_names) > 1
            else mesh.axis_names[0])
    pars = solver.pars
    consts = solver.consts
    B = bx.shape[0]
    n_dev = mesh.devices.size
    assert B % n_dev == 0, f"batch {B} must divide mesh size {n_dev}"
    bx, bu, bp = shard_batch((jnp.asarray(bx, solver.dtype),
                              jnp.asarray(bu, solver.dtype),
                              jnp.asarray(bp, solver.dtype)), mesh, axis)

    def shard_fn(bx, bu, bp):
        """Runs on each shard with the LOCAL (B/n_dev)-scenario slice."""
        Bl = bx.shape[0]
        bdltv = jax.vmap(
            lambda x, u, p: solver._discretize(x, u, p, consts))(bx, bu, bp)
        bJ = jnp.full((Bl,), jnp.inf, solver.dtype)
        done0 = jnp.zeros(Bl, bool)
        stat0 = jnp.full(Bl, int(SCPStatus.FAILED), jnp.int32)
        itr0 = jnp.zeros(Bl, jnp.int32)
        ipmst0 = jnp.full(Bl, int(ipm.IPMStatus.MAX_ITER), jnp.int32)
        active0 = jax.lax.psum(
            jnp.asarray(Bl, jnp.int32), axis).astype(jnp.int32)

        def cond(carry):
            it = carry[0]
            global_active = carry[-1]
            return (it < n_iters) & (global_active > 0)

        def body(carry):
            (it, x, u, p, dltv, J, done, status, iters, ipmst, _) = carry
            out = jax.vmap(
                lambda xx, uu, pp, dd, JJ, act: solver._step_impl(
                    xx, uu, pp, dd, JJ, consts, active=act)
            )(x, u, p, dltv, J, ~done)
            finite = jnp.isfinite(out["J_aug"])
            stop = ((it > 0) & out["feas"]
                    & ((jnp.abs(out["improv_rel"]) <= pars.eps_rel)
                       | (out["deviation"] <= pars.eps_abs)))
            newly_done = ~done & (stop | ~finite)
            adv = ~done & finite
            sel = lambda a, b: jnp.where(
                adv.reshape((Bl,) + (1,) * (a.ndim - 1)), a, b)
            x_n = sel(out["x"], x)
            u_n = sel(out["u"], u)
            p_n = sel(out["p"], p)
            dltv_n = jax.tree_util.tree_map(
                lambda a, b: jnp.where(
                    adv.reshape((Bl,) + (1,) * (a.ndim - 1)), a, b),
                out["dltv"], dltv)
            J_n = jnp.where(adv, out["J_aug"], J)
            status_n = jnp.where(
                newly_done,
                jnp.where(stop & finite, int(SCPStatus.SOLVED),
                          int(SCPStatus.FAILED)).astype(jnp.int32),
                status)
            ipmst_n = jnp.where(adv, out["ipm_status"], ipmst)
            iters_n = jnp.where(~done, it + 1, iters).astype(jnp.int32)
            done_n = done | newly_done
            # the collective: every shard votes its active count; the loop
            # continues only while someone, somewhere, is still working
            global_active = jax.lax.psum(
                jnp.sum((~done_n).astype(jnp.int32)), axis).astype(jnp.int32)
            return (it + 1, x_n, u_n, p_n, dltv_n, J_n, done_n, status_n,
                    iters_n, ipmst_n, global_active)

        (it, x, u, p, dltv, J, done, status, iters, ipmst, _) = (
            jax.lax.while_loop(
                cond,
                body,
                (jnp.asarray(0, jnp.int32), bx, bu, bp, bdltv, bJ, done0,
                 stat0, itr0, ipmst0, active0)))
        ipm_ok = ((ipmst == int(ipm.IPMStatus.OPTIMAL))
                  | (ipmst == int(ipm.IPMStatus.ALMOST_OPTIMAL)))
        status = jnp.where(~done & ipm_ok,
                           jnp.asarray(int(SCPStatus.SOLVED), jnp.int32),
                           status)
        defect = jnp.max(
            jnp.abs(dltv.defects / solver.scaling.Sx[None, None, :]),
            axis=(1, 2))
        feas = defect <= pars.feas_tol
        # psum'd global statistics (replicated outputs)
        n_feas = jax.lax.psum(jnp.sum(feas.astype(jnp.int32)), axis)
        tot_it = jax.lax.psum(jnp.sum(iters), axis)
        return x, u, p, J, feas, status, iters, n_feas, tot_it, it

    spec_b = P(axis)
    spec_r = P()
    fn = jax.jit(jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(spec_b, spec_b, spec_b),
        out_specs=(spec_b, spec_b, spec_b, spec_b, spec_b, spec_b, spec_b,
                   spec_r, spec_r, spec_r),
        # the discretizer's scan carries start from unvarying constants
        # (identity STMs); the varying-axis type checker rejects that mix
        # even though the program is valid SPMD
        check_vma=False))
    (x, u, p, J, feas, status, iters, n_feas, tot_it, outer) = fn(bx, bu, bp)
    return CollectiveResult(
        x=x, u=u, p=p, J_aug=J, feas=feas, status=status, iters=iters,
        n_feasible=n_feas, total_iters=tot_it, outer_iters=outer)
