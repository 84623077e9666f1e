"""Double integrator with friction — the smallest bundled example
(reference test/examples/double_integrator/: state (position, velocity),
scalar acceleration input, friction g, travel distance s over horizon T;
parameters.jl:46-80). The reference solves it by LCvx; here it is also the
minimum end-to-end PTR problem (BASELINE.json configs[0]).

Two variants:
  * linear friction (vdot = u - g v): the problem is convex, so PTR must
    recover the global optimum — the test cross-checks against the
    controllability-Gramian minimum-energy solution, in the spirit of the
    reference's Pontryagin cross-check (double_integrator/definition.jl:137).
  * quadratic drag (vdot = u - g v|v|): genuinely nonconvex path for SCP.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from scptoolbox_tpu.parser.problem import (BoundingBox, TrajectoryProblem,
                                           nonpos)


@dataclasses.dataclass(frozen=True)
class DoubleIntegratorParameters:
    """Model parameters (reference double_integrator/parameters.jl:20-33)."""

    T: float = 10.0     # trajectory duration [s]
    g: float = 0.1      # friction coefficient
    s: float = 47.0     # travel distance
    u_max: float = 10.0 # acceleration bound
    drag: bool = False  # quadratic (nonconvex) vs linear friction


def double_integrator(mdl: DoubleIntegratorParameters = DoubleIntegratorParameters()):
    """Build the TrajectoryProblem. Time is normalized to [0, 1] with the
    fixed dilation T folded into the dynamics (the reference's free-final-
    time problems put the dilation in p; here T is fixed)."""
    T, g, s, u_max = mdl.T, mdl.g, mdl.s, mdl.u_max

    def f(t, x, u, p):
        v = x[1]
        fric = g * v * jnp.abs(v) if mdl.drag else g * v
        return T * jnp.stack([v, u[0] - fric])

    def running_cost(t, k, x, u, p):
        return T * (u @ u)   # integral of u^2 over physical time

    def U(t, k, u, p):
        return [nonpos(jnp.concatenate([u - u_max, -u - u_max]))]

    def gic(x, p):
        return x - jnp.asarray([0.0, 0.0])

    def gtc(x, p):
        return x - jnp.asarray([s, 0.0])

    def guess(N):
        tau = np.linspace(0.0, 1.0, N)
        x = np.stack([s * tau, np.full(N, s / T)], axis=1)
        u = np.zeros((N, 1))
        return jnp.asarray(x), jnp.asarray(u), jnp.zeros(0)

    return TrajectoryProblem(
        nx=2, nu=1, np=0, f=f, guess=guess,
        running_cost=running_cost, U=U, gic=gic, gtc=gtc,
        xrg=BoundingBox(lo=jnp.asarray([0.0, -s / T]),
                        hi=jnp.asarray([s, 3.0 * s / T])),
        urg=BoundingBox(lo=jnp.asarray([-u_max]), hi=jnp.asarray([u_max])),
    )
