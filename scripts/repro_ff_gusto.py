#!/usr/bin/env python
"""Repro: freeflyer GuSTO (reference freeflyer/tests.jl:83-150 config,
N reduced like the suite's SCvx battery). Prints the iteration table."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

from scptoolbox_tpu.config import SCPStatus
from scptoolbox_tpu.models.freeflyer import FreeFlyerParameters, freeflyer
from scptoolbox_tpu.solvers import gusto

N = int(sys.argv[1]) if len(sys.argv) > 1 else 30
pbm = freeflyer(FreeFlyerParameters(), N=N)
pars = gusto.GuSTOParameters(
    N=N, Nsub=15, iter_max=15,
    lam_init=1e4, lam_max=1e9, rho_0=0.1, rho_1=0.5,
    beta_sh=2.0, beta_gr=2.0, gamma_fail=5.0,
    eta_init=1.0, eta_lb=1e-3, eta_ub=10.0,
    mu=0.8, iter_mu=16, eps_abs=0.0, eps_rel=0.0,
    feas_tol=1e-3, pen="quad", hom=500.0)
sol = gusto.solve(pbm, pars, verbose=True)
print("status:", SCPStatus(sol.status).name, "cost:", float(sol.cost),
      "iters:", sol.iterations, "feasible:", bool(sol.feasible))
for r in sol.history:
    print(r.iteration, "J=%.6e" % r.J_aug, "feas=%d" % r.feas,
          "defect=%.2e" % r.defect_norm,
          {k: (float(v) if hasattr(v, "__float__") else v)
           for k, v in r.extras.items()})
