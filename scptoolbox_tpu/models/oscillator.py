"""Damped oscillator with actuator deadband (reference
test/examples/oscillator/: parameters.jl:22-115, definition.jl:34-473,
tests.jl:21-93).

A 1-DoF damped oscillator must be brought to rest with an acceleration
actuator that has a DEADBAND: commanded (reference) accelerations ar with
|ar| < a_db produce zero actual acceleration aa. The discrete on/off logic
is smoothed with the sigmoid OR homotopy (helper.jl:775-807): the nonconvex
path constraint enforces aa = OR(ar) * ar where OR -> exact indicator as
the sharpness kappa1 grows along a 10-point homotopy ladder, each stage
warm-started from the previous (tests.jl:58-72). Costs are L1: position
magnitude (via per-node parameters l1r), actual-acceleration magnitude, and
deadband-violation magnitude |aa - ar|.

TPU-native notes: kappa1 lives in TrajectoryProblem.consts, a TRACED input
of the jitted PTR step — the entire homotopy ladder re-runs ONE compiled
program (the reference re-solves through JuMP per stage). The per-node L1
epigraph variables are the input slots l1aa/l1adiff and the parameter
vector p = l1r (np = N), exactly the reference's encoding.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from scptoolbox_tpu.parser.problem import (BoundingBox, TrajectoryProblem,
                                           l1, nonpos)
from scptoolbox_tpu.solvers import ptr
from scptoolbox_tpu.solvers.solution import SCPSolution
from scptoolbox_tpu.utils.smooth import Homotopy, smooth_or

# input slot indices (reference parameters.jl:69-75)
ID_AA, ID_AR, ID_L1AA, ID_L1ADIFF = 0, 1, 2, 3


@dataclasses.dataclass(frozen=True)
class OscillatorParameters:
    """Model constants (reference parameters.jl:78-112)."""

    zeta: float = 0.5      # damping ratio
    w0: float = 1.0        # [rad/s] natural frequency
    a_db: float = 0.05     # [m/s^2] deadband acceleration
    a_max: float = 0.3     # [m/s^2] maximum acceleration
    r0: float = 1.0        # [m] initial position
    v0: float = 0.0        # [m/s] initial velocity
    tf: float = 10.0       # [s] trajectory duration
    alpha: float = 0.06    # control usage weight
    gamma: float = 1e-1    # deadband-relaxation weight


def oscillator(N: int,
               mdl: OscillatorParameters = OscillatorParameters()
               ) -> TrajectoryProblem:
    """Build the TrajectoryProblem at grid size N (np = N: per-node |r|
    epigraph parameters, reference definition.jl:36-42)."""
    tf, w0, zeta = mdl.tf, mdl.w0, mdl.zeta
    a_db, a_max = mdl.a_db, mdl.a_max

    def f(t, x, u, p):
        # definition.jl:147-185 (time-dilated by the constant tf)
        r, v = x[0], x[1]
        aa = u[ID_AA]
        return tf * jnp.stack([v, aa - w0 ** 2 * r - 2.0 * zeta * w0 * v])

    def running_cost(t, k, x, u, p):
        # definition.jl:113-139: L1 position + control magnitudes
        return (p[k] / mdl.r0 + mdl.alpha * u[ID_L1AA] / a_max
                + mdl.gamma * u[ID_L1ADIFF] / a_max)

    def X(t, k, x, p):
        # l1r_k >= |r_k| (definition.jl:236-259)
        return [l1(jnp.concatenate([p[k][None], x[0:1]]))]

    def U(t, k, u, p):
        # |aa| <= a_max, |ar| <= a_max, l1aa >= |aa|, l1adiff >= |aa - ar|
        # (definition.jl:263-360)
        aa, ar = u[ID_AA], u[ID_AR]
        return [
            nonpos(jnp.stack([aa - a_max, -a_max - aa,
                              ar - a_max, -a_max - ar])),
            l1(jnp.stack([u[ID_L1AA], aa])),
            l1(jnp.stack([u[ID_L1ADIFF], aa - ar])),
        ]

    def s(t, k, x, u, p, consts):
        # deadband logic aa = OR(ar) * ar via smooth OR at traced sharpness
        # kappa1 (definition.jl:370-440); homotopy updates never re-trace
        aa, ar = u[ID_AA], u[ID_AR]
        OR = smooth_or([ar - a_db, -a_db - ar], kappa=consts["kappa1"],
                       match=a_max - a_db, normalize=a_max - a_db)
        return jnp.stack([aa - OR * ar, OR * ar - aa])

    def gic(x, p):
        return x - jnp.asarray([mdl.r0, mdl.v0])

    def guess(N_, consts):
        # passive coasting from x0, idle inputs, l1r from the coast
        # (definition.jl:69-109)
        x = np.zeros((N_, 2))
        x[0] = [mdl.r0, mdl.v0]
        tau = np.linspace(0.0, 1.0, N_)
        nsub = 40
        for k in range(N_ - 1):
            xk = x[k]
            h = (tau[k + 1] - tau[k]) / nsub
            for _ in range(nsub):
                fdot = lambda xx: tf * np.asarray(
                    [xx[1], -w0 ** 2 * xx[0] - 2 * zeta * w0 * xx[1]])
                k1 = fdot(xk)
                k2 = fdot(xk + h / 2 * k1)
                k3 = fdot(xk + h / 2 * k2)
                k4 = fdot(xk + h * k3)
                xk = xk + h / 6 * (k1 + 2 * k2 + 2 * k3 + k4)
            x[k + 1] = xk
        u = np.zeros((N_, 4))
        p = np.abs(x[:, 0])
        return jnp.asarray(x), jnp.asarray(u), jnp.asarray(p)

    return TrajectoryProblem(
        nx=2, nu=4, np=N, f=f, guess=guess,
        consts={"kappa1": jnp.asarray(1.0)},
        running_cost=running_cost, X=X, U=U, s=s, gic=gic,
        xrg=BoundingBox(lo=jnp.asarray([-mdl.r0, -1.0]),
                        hi=jnp.asarray([mdl.r0, 1.0])),
        urg=BoundingBox(
            lo=jnp.asarray([-a_max, -a_max, 0.0, 0.0]),
            hi=jnp.asarray([a_max, a_max, a_max, 2 * a_max])),
        prg=BoundingBox(lo=jnp.zeros(N), hi=jnp.full(N, mdl.r0)),
    )


def solve_oscillator(N: int = 30, n_hom: int = 10,
                     mdl: OscillatorParameters = OscillatorParameters(),
                     pars: ptr.PTRParameters = None,
                     verbose: bool = False) -> SCPSolution:
    """PTR + homotopy continuation over the deadband sharpness
    (reference tests.jl:21-93): Nhom stages, each warm-started, each just a
    re-run of the SAME compiled PTR step with a new kappa1."""
    pbm = oscillator(N, mdl)
    if pars is None:
        pars = ptr.PTRParameters(
            N=N, Nsub=10, iter_max=10, wvc=1e2, wtr=1e-3,
            eps_abs=-np.inf, eps_rel=1e-5, feas_tol=5e-3)
    solver = ptr.PTR(pbm, pars)
    hom = Homotopy(delta_min=1e-8)
    grid = np.linspace(0.0, 1.0, n_hom)
    sol = None
    for i in range(n_hom):
        solver.consts = {"kappa1": jnp.asarray(float(hom(grid[i])))}
        if verbose:
            print(f"[{i + 1}/{n_hom}] homotopy kappa1 = "
                  f"{float(hom(grid[i])):.2e}")
        sol = solver.solve(warm=sol, verbose=verbose)
    return sol
