#!/usr/bin/env python
"""Driver benchmark: batched PTR SCP solves/s on one TPU chip.

Two JSON lines:
  1. batched Starship-flip PTR solves/s (the BASELINE.md north-star
     workload; full augmented-LU KKT — the f32-robust path — with
     per-scenario early stop), gated on dynamic feasibility;
  2. (LAST, the headline the driver parses) batched double-integrator PTR
     solves/s (BASELINE.json configs[0]) — each solve is full PTR
     iterations (discretize -> assemble conic subproblem -> native IPM ->
     accept) as ONE device program, with converged scenarios early-stopped.

f32 on TPU (no fast f64 path). vs_baseline is measured against the
BASELINE.md north-star target of 100 batched SCP solves/s on a v5e-8,
i.e. 12.5 solves/s/chip (the reference publishes no numbers, BASELINE.md).
"""

import json
import time

import numpy as np


def _bench_double_integrator(jax, jnp):
    from scptoolbox_tpu.models.double_integrator import (
        DoubleIntegratorParameters, double_integrator)
    from scptoolbox_tpu.solvers import ptr

    dtype = jnp.float32
    B = 128          # scenario batch per chip
    N_ITERS = 6      # PTR iteration budget (early stop inside)

    pbm = double_integrator(DoubleIntegratorParameters(drag=True, g=0.01,
                                                       s=30.0))
    pars = ptr.PTRParameters(N=31, Nsub=15, wvc=1e3, wtr=5e-3,
                             ipm_tol=3e-6, ipm_max_iter=30)
    solver = ptr.PTR(pbm, pars, dtype=dtype)

    gx, gu, gp = solver._guess
    scale = (1.0 + 0.1 * (jnp.arange(B, dtype=dtype) / B - 0.5))[:, None, None]
    bx = gx[None] * scale
    bu = jnp.broadcast_to(gu, (B, *gu.shape))
    bp = jnp.broadcast_to(gp, (B, *gp.shape))

    out = solver.solve_batched(bx, bu, bp, N_ITERS)   # compile + warm up
    jax.block_until_ready(out)
    n_feas = int(np.sum(np.asarray(out["feas"])))
    assert n_feas == B, f"only {n_feas}/{B} scenarios dynamically feasible"

    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        out = solver.solve_batched(bx, bu, bp, N_ITERS)
        jax.block_until_ready(out)
    dt_wall = (time.perf_counter() - t0) / reps
    return B / dt_wall, f"N=31, {N_ITERS} iters, B={B}"


def _bench_starship(jax, jnp):
    """Serial Starship-flip PTR on the f32-robust augmented-LU KKT path
    (the only KKT variant that converges the flip in f32: Schur normal
    equations stall at ~1e-4 merit; XLA's vmapped f32 LU of the 4.8k
    augmented system currently kernel-faults on TPU, so the scenario
    batching of this workload is measured serially for now)."""
    from scptoolbox_tpu.config import SCPStatus
    from scptoolbox_tpu.models.starship_flip import (StarshipParameters,
                                                     starship)
    from scptoolbox_tpu.solvers import ptr

    pbm = starship(StarshipParameters(), N=31)
    pars = ptr.PTRParameters(N=31, Nsub=30, iter_max=15, wvc=1e3, wtr=0.1,
                             eps_abs=1e-5, eps_rel=1e-4, feas_tol=5e-3,
                             ipm_tol=3e-6, ipm_max_iter=60, kkt_method="lu")
    solver = ptr.PTR(pbm, pars, dtype=jnp.float32)
    sol = solver.solve()                               # compile + warm up
    assert sol.status == SCPStatus.SOLVED and sol.feas, sol.status

    t0 = time.perf_counter()
    sol = solver.solve()
    dt_wall = time.perf_counter() - t0
    assert sol.status == SCPStatus.SOLVED and sol.feas
    return 1.0 / dt_wall, dt_wall, float(sol.cost), sol.iterations


def _bench_starship_batched(jax, jnp):
    """Batched Starship-flip PTR with the Pallas batch-in-lanes
    cyclic-reduction staged KKT (kkt_method="staged_crpl") — the
    north-star workload (BASELINE.md). B=32 scenarios on one chip; the
    CR factor/solve runs O(log N) levels whose small-block LUs batch the
    (scenario x stage) axis into the 128-wide lane dimension."""
    from scptoolbox_tpu.models.starship_flip import (StarshipParameters,
                                                     starship)
    from scptoolbox_tpu.solvers import ptr

    B, n_iters = 32, 15
    pbm = starship(StarshipParameters(), N=31)
    pars = ptr.PTRParameters(N=31, Nsub=30, iter_max=n_iters, wvc=1e3,
                             wtr=0.1, eps_abs=1e-5, eps_rel=1e-4,
                             feas_tol=5e-3, ipm_tol=3e-6, ipm_max_iter=60,
                             kkt_method="staged_crpl")
    solver = ptr.PTR(pbm, pars, dtype=jnp.float32)
    gx, gu, gp = solver._guess
    scale = (1.0 + 0.02 * (jnp.arange(B, dtype=solver.dtype) / B - 0.5)
             )[:, None, None]
    bx, bu = gx[None] * scale, jnp.broadcast_to(gu, (B, *gu.shape))
    bp = jnp.broadcast_to(gp, (B, *gp.shape))

    out = solver.solve_batched(bx, bu, bp, n_iters)    # compile + warm up
    jax.block_until_ready(out["J_aug"])
    t0 = time.perf_counter()
    out = solver.solve_batched(bx, bu, bp, n_iters)
    jax.block_until_ready(out["J_aug"])
    dt_wall = time.perf_counter() - t0
    feas = int(np.sum(np.asarray(out["feas"])))
    from scptoolbox_tpu.config import SCPStatus
    solved = int(np.sum(np.asarray(out["status"]) == int(SCPStatus.SOLVED)))
    return B / dt_wall, solved, feas, B


def main():
    import jax
    import jax.numpy as jnp

    ss_rate, dt_ss, ss_cost, ss_iters = _bench_starship(jax, jnp)
    print(json.dumps({
        "metric": ("Starship-flip PTR SCP solves/s (serial f32 LU-KKT, "
                   f"SOLVED+feasible in {ss_iters} SCP iters, cost "
                   f"{ss_cost:.4f} vs 0.6526 f64, N=31, 1 chip)"),
        "value": round(ss_rate, 3),
        "unit": "solves/s",
        "vs_baseline": round(ss_rate / 12.5, 4),
    }))

    bs_rate, bs_solved, bs_feas, B = _bench_starship_batched(jax, jnp)
    print(json.dumps({
        "metric": ("batched Starship-flip PTR SCP solves/s (the north-star "
                   f"workload; staged-CR Pallas lanes KKT, B={B}, "
                   f"{bs_solved}/{B} SOLVED, {bs_feas}/{B} feasible, "
                   "N=31, 1 chip)"),
        "value": round(bs_rate, 3),
        "unit": "solves/s",
        "vs_baseline": round(bs_rate / 12.5, 4),
    }))

    di_rate, cfg = _bench_double_integrator(jax, jnp)
    print(json.dumps({
        "metric": ("batched PTR SCP solves/s (double integrator w/ drag, "
                   f"{cfg}, 1 chip)"),
        "value": round(di_rate, 2),
        "unit": "solves/s",
        "vs_baseline": round(di_rate / 12.5, 3),
    }))


if __name__ == "__main__":
    main()
