#!/usr/bin/env python
"""Measure batched Starship-flip PTR throughput on one TPU chip.

Usage: python scripts/measure_starship.py <kkt_method|dense> <B> [n_iters]

B=0 -> serial solve(). Prints one JSON line with wall time, solves/s,
SOLVED count, and cost stats. This is the measurement harness behind
BASELINE.md's round-5 table (the north-star workload).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    method = sys.argv[1]
    B = int(sys.argv[2])
    n_iters = int(sys.argv[3]) if len(sys.argv) > 3 else 15

    import jax
    import jax.numpy as jnp

    from scptoolbox_tpu.config import SCPStatus
    from scptoolbox_tpu.models.starship_flip import (StarshipParameters,
                                                     starship)
    from scptoolbox_tpu.solvers import ptr

    kkt = None if method == "dense" else method
    if method == "dense":
        kkt = "lu"
    pbm = starship(StarshipParameters(), N=31)
    pars = ptr.PTRParameters(N=31, Nsub=30, iter_max=n_iters, wvc=1e3,
                             wtr=0.1, eps_abs=1e-5, eps_rel=1e-4,
                             feas_tol=5e-3, ipm_tol=3e-6, ipm_max_iter=60,
                             kkt_method=kkt)
    solver = ptr.PTR(pbm, pars, dtype=jnp.float32)

    if B == 0:
        t0 = time.perf_counter()
        sol = solver.solve()
        t_compile = time.perf_counter() - t0
        t0 = time.perf_counter()
        sol = solver.solve()
        dt = time.perf_counter() - t0
        print(json.dumps({
            "method": method, "B": 0, "wall_s": round(dt, 3),
            "compile_s": round(t_compile - dt, 1),
            "solves_per_s": round(1.0 / dt, 4),
            "status": str(sol.status), "feas": bool(sol.feas),
            "cost": round(float(sol.cost), 5), "iters": sol.iterations}))
        return

    gx, gu, gp = solver._guess
    rng = np.random.default_rng(0)
    # perturb the initial guess per scenario (scenario spread ~ the
    # reference's NUM_TRIALS re-solve loop, but genuinely distinct)
    pert = 1.0 + 0.02 * jnp.asarray(
        rng.standard_normal((B, 1, 1)), jnp.float32)
    bx = gx[None] * pert
    bu = jnp.broadcast_to(gu, (B, *gu.shape)).copy()
    bp = jnp.broadcast_to(gp, (B, *gp.shape)).copy()

    t0 = time.perf_counter()
    out = solver.solve_batched(bx, bu, bp, n_iters)
    jax.block_until_ready(out)
    t_compile = time.perf_counter() - t0

    t0 = time.perf_counter()
    out = solver.solve_batched(bx, bu, bp, n_iters)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    status = np.asarray(out["status"])
    feas = np.asarray(out["feas"])
    costs = np.asarray(out["J_aug"], np.float64)
    solved = (status == int(SCPStatus.SOLVED)) & feas
    print(json.dumps({
        "method": method, "B": B, "wall_s": round(dt, 3),
        "compile_s": round(t_compile - dt, 1),
        "solves_per_s": round(B / dt, 4),
        "solved": int(solved.sum()), "feasible": int(feas.sum()),
        "cost_min": round(float(costs.min()), 5),
        "cost_max": round(float(costs.max()), 5),
        "iters_mean": round(float(np.asarray(out["iters"]).mean()), 2)}))


if __name__ == "__main__":
    main()
