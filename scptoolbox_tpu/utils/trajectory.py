"""Continuous-time trajectory container.

Capability parity with reference src/utils/trajectory.jl (:30-82):
`ContinuousTimeTrajectory(t, x, interp)` with :linear/:zoh/:impulse sampling.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from scptoolbox_tpu.utils.interp import diracinterp, linterp, zohinterp


class ContinuousTimeTrajectory(NamedTuple):
    """Sampled trajectory with an interpolation rule.

    interp is one of "linear", "zoh", "impulse" (static; selects the sampling
    kernel at trace time).
    """

    t: jnp.ndarray  # (N,)
    x: jnp.ndarray  # (N, dim)
    interp: str = "linear"


def sample(traj: ContinuousTimeTrajectory, t):
    """Evaluate the trajectory at time t (reference trajectory.jl:71-82)."""
    if traj.interp == "linear":
        return linterp(t, traj.x, traj.t)
    if traj.interp == "zoh":
        return zohinterp(t, traj.x, traj.t)
    if traj.interp == "impulse":
        return diracinterp(t, traj.x, traj.t)
    raise ValueError(f"unknown interpolation '{traj.interp}'")
