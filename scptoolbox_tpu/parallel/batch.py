"""Mesh-sharded scenario-batch SCP solving (SURVEY.md section 2.8: the
reference's serial trials loop, quadrotor/tests.jl:160-202, becomes SPMD
scenario parallelism over a jax.sharding.Mesh).

The design follows the scaling-book recipe: pick a mesh, annotate input
shardings, let XLA insert the collectives. A scenario batch of SCP solves
(initial-condition sweeps, Monte-Carlo dispersions, homotopy grids) is laid
out over the `batch` mesh axis; the vmapped jitted SCP step then partitions
automatically — per-scenario work is independent, so the compiled program
contains no cross-device communication in the hot loop, and convergence
statistics reduce at the end.

Works identically on a real TPU slice and on the virtual CPU mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=N) used by the tests.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis: str = "batch") -> Mesh:
    """1D device mesh over the first n devices (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def make_mesh_2d(n_hosts: int, n_per_host: Optional[int] = None,
                 axes: Sequence[str] = ("host", "batch")) -> Mesh:
    """2D (host x batch) device mesh — the multi-host layout: the OUTER
    axis maps across hosts (collectives over it ride DCN on a real pod)
    and the INNER axis across each host's chips (ICI). On a single
    process, rows of jax.devices() stand in for hosts; on a real multi-
    host slice, jax.devices() is already globally ordered host-major, so
    the same reshape puts each host's chips in one row."""
    devs = jax.devices()
    if n_per_host is None:
        assert len(devs) % n_hosts == 0, (len(devs), n_hosts)
        n_per_host = len(devs) // n_hosts
    grid = np.asarray(devs[: n_hosts * n_per_host]).reshape(
        n_hosts, n_per_host)
    return Mesh(grid, tuple(axes))


def shard_batch(tree, mesh: Mesh, axis: str = "batch"):
    """Place every leaf's leading (scenario) axis over the mesh."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda a: jax.device_put(a, sharding), tree)


class BatchResult(NamedTuple):
    """Batched solve outputs + cross-scenario convergence summary."""

    x: jnp.ndarray            # (B, N, nx)
    u: jnp.ndarray            # (B, N, nu)
    p: jnp.ndarray            # (B, np)
    J_aug: jnp.ndarray        # (B,)
    feas: jnp.ndarray         # (B,) bool
    defect_norm: jnp.ndarray  # (B,)
    n_feasible: int
    traces: dict              # per-iteration (n_iters, B) diagnostics


def solve_batched_sharded(solver, bx, bu, bp, n_iters: int,
                          mesh: Optional[Mesh] = None,
                          axis: str = "batch") -> BatchResult:
    """Run `solver.solve_batched` (fixed-iteration vmapped SCP) with the
    scenario batch sharded over a device mesh. The batch size must divide
    the mesh size. `solver` is a PTR instance (the other algorithms'
    accept/reject logic is host-side; PTR's always-accept rule is the
    device-resident batched path, reference ptr.jl:509)."""
    if mesh is None:
        mesh = make_mesh(axis=axis)
    B = bx.shape[0]
    n_dev = mesh.devices.size
    assert B % n_dev == 0, f"batch {B} must divide mesh size {n_dev}"
    bx, bu, bp = shard_batch((jnp.asarray(bx, solver.dtype),
                              jnp.asarray(bu, solver.dtype),
                              jnp.asarray(bp, solver.dtype)), mesh, axis)
    out = solver.solve_batched(bx, bu, bp, n_iters)
    feas = out["feas"]
    return BatchResult(
        x=out["x"], u=out["u"], p=out["p"], J_aug=out["J_aug"],
        feas=feas, defect_norm=out["defect_norm"],
        n_feasible=int(jnp.sum(feas)), traces=out["traces"])


def scenario_sweep(solver, perturb: Callable, B: int, n_iters: int,
                   mesh: Optional[Mesh] = None) -> BatchResult:
    """Monte-Carlo / sweep harness: build B scenario guesses by applying
    `perturb(i, x, u, p) -> (x, u, p)` to the solver's nominal guess (the
    reference re-solves serially for statistics, runtests.jl:29), then
    solve the whole batch as one sharded device program."""
    gx, gu, gp = solver._guess
    idx = jnp.arange(B)
    bx, bu, bp = jax.vmap(lambda i: perturb(i, gx, gu, gp))(idx)
    return solve_batched_sharded(solver, bx, bu, bp, n_iters, mesh=mesh)
