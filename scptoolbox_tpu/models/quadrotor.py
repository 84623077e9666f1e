"""Quadrotor obstacle-avoidance problem (reference test/examples/quadrotor/:
parameters.jl:95-135, definition.jl:27-360).

State (r, v) in R^6, input (a, sigma) in R^4 (acceleration + LCvx slack),
parameter tdil (free final time / time dilation). Free flight between rest
states past two cylindrical ellipsoid keep-out zones, with the classic
thrust LCvx relaxation sigma >= ||a||, tilt SOC, and min/max accel bounds.

Solved by SCvx and GuSTO in the reference test suite (quadrotor/tests.jl).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from scptoolbox_tpu.parser.problem import (BoundingBox, TrajectoryProblem,
                                           nonpos, soc)
from scptoolbox_tpu.utils.geometry import Ellipsoid


@dataclasses.dataclass(frozen=True)
class QuadrotorParameters:
    """Model parameters (reference quadrotor/parameters.jl:95-135)."""

    g: float = 9.81
    u_max: float = 23.2
    u_min: float = 0.6
    tilt_max_deg: float = 60.0
    tf_min: float = 0.0
    tf_max: float = 2.5
    gamma: float = 0.0      # terminal-vs-running cost tradeoff
    r0: Tuple[float, ...] = (0.0, 0.0, 0.0)
    rf: Tuple[float, ...] = (2.5, 6.0, 0.0)

    def obstacles(self):
        """Two cylindrical keep-out ellipsoids (parameters.jl:115-118)."""
        return [
            Ellipsoid(jnp.diag(jnp.asarray([2.0, 2.0, 0.0])),
                      jnp.asarray([1.0, 2.0, 0.0])),
            Ellipsoid(jnp.diag(jnp.asarray([1.5, 1.5, 0.0])),
                      jnp.asarray([2.0, 5.0, 0.0])),
        ]


def quadrotor(mdl: QuadrotorParameters = QuadrotorParameters()) -> TrajectoryProblem:
    """Build the TrajectoryProblem (reference definition.jl:27-360)."""
    g_vec = jnp.asarray([0.0, 0.0, -mdl.g])
    hover = mdl.g
    gam = mdl.gamma
    obs = mdl.obstacles()
    cos_tilt = float(np.cos(np.deg2rad(mdl.tilt_max_deg)))
    r0 = jnp.asarray(mdl.r0)
    rf = jnp.asarray(mdl.rf)

    def f(t, x, u, p):
        # definition.jl:140-155: time-dilated double integrator with gravity
        v = x[3:6]
        a = u[:3]
        return p[0] * jnp.concatenate([v, a + g_vec])

    def terminal_cost(x, p):
        # definition.jl:203-211
        return gam * (p[0] / mdl.tf_max) ** 2

    def running_cost(t, k, x, u, p):
        # definition.jl:215-228 (SCvx form; GuSTO's S-matrix form is the
        # same quadratic)
        return (1.0 - gam) * (u[3] / hover) ** 2

    def U(t, k, u, p):
        # definition.jl:187-244: sigma bounds, LCvx SOC, tilt, duration
        a = u[:3]
        sig = u[3]
        return [
            nonpos(jnp.stack([mdl.u_min - sig, sig - mdl.u_max])),
            soc(jnp.concatenate([sig[None], a])),
            nonpos(jnp.stack([sig * cos_tilt - a[2],
                              p[0] - mdl.tf_max, mdl.tf_min - p[0]])),
        ]

    def s(t, k, x, u, p):
        # definition.jl:258-269: obstacle keep-out s_i = 1 - E_i(r) <= 0
        r = x[:3]
        return jnp.stack([1.0 - E(r) for E in obs])

    def gic(x, p):
        return x - jnp.concatenate([r0, jnp.zeros(3)])

    def gtc(x, p):
        return x - jnp.concatenate([rf, jnp.zeros(3)])

    def guess(N):
        # definition.jl:160-185: straight line, hover inputs, mid duration
        x0 = np.concatenate([np.asarray(mdl.r0), np.zeros(3)])
        xf = np.concatenate([np.asarray(mdl.rf), np.zeros(3)])
        tau = np.linspace(0.0, 1.0, N)[:, None]
        x = x0[None, :] * (1 - tau) + xf[None, :] * tau
        u = np.tile(np.asarray([0.0, 0.0, mdl.g, mdl.g]), (N, 1))
        p = np.asarray([0.5 * (mdl.tf_min + mdl.tf_max)])
        return jnp.asarray(x), jnp.asarray(u), jnp.asarray(p)

    # scaling: the reference advises only the parameter (definition.jl:49-58);
    # the unadvised states keep the default [0,1] box (S=1), and the inputs
    # get the bounds the reference's min/max LPs would find from U
    # (a in the sigma <= u_max ball, sigma in [u_min, u_max])
    um = mdl.u_max
    return TrajectoryProblem(
        nx=6, nu=4, np=1, f=f, guess=guess,
        terminal_cost=terminal_cost, running_cost=running_cost,
        U=U, s=s, gic=gic, gtc=gtc,
        urg=BoundingBox(
            lo=jnp.asarray([-um, -um, -um, mdl.u_min]),
            hi=jnp.asarray([um, um, um, um])),
        prg=BoundingBox(lo=jnp.asarray([mdl.tf_min]),
                        hi=jnp.asarray([mdl.tf_max])),
    )
