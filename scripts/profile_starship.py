#!/usr/bin/env python
"""Record a jax.profiler trace of the batched Starship-flip PTR step
(the north-star workload) under the given KKT method.

Usage: python scripts/profile_starship.py <kkt_method> <B> [outdir]
Writes the trace under profiles/bench_r05/<kkt_method>_B<B>/ by default
(VERDICT r4 item 9: profile the workload being optimized, not the DI bench).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    method = sys.argv[1]
    B = int(sys.argv[2])
    outdir = (sys.argv[3] if len(sys.argv) > 3 else
              os.path.join(os.path.dirname(os.path.dirname(
                  os.path.abspath(__file__))),
                  "profiles", "bench_r05", f"{method}_B{B}"))

    import jax
    import jax.numpy as jnp

    from scptoolbox_tpu.models.starship_flip import (StarshipParameters,
                                                     starship)
    from scptoolbox_tpu.solvers import ptr

    pbm = starship(StarshipParameters(), N=31)
    pars = ptr.PTRParameters(N=31, Nsub=30, iter_max=3, wvc=1e3, wtr=0.1,
                             eps_abs=1e-5, eps_rel=1e-4, feas_tol=5e-3,
                             ipm_tol=3e-6, ipm_max_iter=60,
                             kkt_method=None if method == "dense" else method)
    solver = ptr.PTR(pbm, pars, dtype=jnp.float32)
    gx, gu, gp = solver._guess
    scale = (1.0 + 0.02 * (jnp.arange(B, dtype=solver.dtype) / B - 0.5)
             )[:, None, None]
    bx, bu = gx[None] * scale, jnp.broadcast_to(gu, (B, *gu.shape))
    bp = jnp.broadcast_to(gp, (B, *gp.shape))

    out = solver.solve_batched(bx, bu, bp, 3)      # compile + warm up
    jax.block_until_ready(out["J_aug"])

    with jax.profiler.trace(outdir):
        out = solver.solve_batched(bx, bu, bp, 3)
        jax.block_until_ready(out["J_aug"])
    print("trace written to", outdir)


if __name__ == "__main__":
    main()
