#!/usr/bin/env python
"""Driver benchmark: batched PTR SCP solves/s on one TPU chip.

Solves a scenario batch of double-integrator-with-drag trajectory problems
(BASELINE.json configs[0]) end-to-end — each solve is `n_iters` full PTR
iterations (discretize -> assemble conic subproblem -> native IPM -> accept)
— as ONE device program (`lax.scan` over iterations of the vmapped step).
f32 on TPU (no fast f64 path); quality is gated on dynamic feasibility of
every scenario.

Prints ONE JSON line. vs_baseline is measured against the BASELINE.md
north-star target of 100 batched SCP solves/s on a v5e-8, i.e. 12.5
solves/s/chip (the reference publishes no numbers, BASELINE.md).
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from scptoolbox_tpu.models.double_integrator import (
        DoubleIntegratorParameters, double_integrator)
    from scptoolbox_tpu.solvers import ptr

    dtype = jnp.float32
    B = 128          # scenario batch per chip
    N_ITERS = 6      # fixed PTR iterations (converges in <= 3-4; margin)

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

    # compile + warm up
    out = solver.solve_batched(bx, bu, bp, N_ITERS)
    jax.block_until_ready(out)
    n_feas = int(np.sum(np.asarray(out["feas"])))
    assert n_feas == B, f"only {n_feas}/{B} scenarios dynamically feasible"

    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        out = solver.solve_batched(bx, bu, bp, N_ITERS)
        jax.block_until_ready(out)
    dt_wall = (time.perf_counter() - t0) / reps

    solves_per_s = B / dt_wall
    baseline_per_chip = 12.5  # north-star 100 solves/s on v5e-8
    print(json.dumps({
        "metric": "batched PTR SCP solves/s (double integrator w/ drag, "
                  f"N=31, {N_ITERS} iters, B={B}, 1 chip)",
        "value": round(solves_per_s, 2),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / baseline_per_chip, 3),
    }))


if __name__ == "__main__":
    main()
