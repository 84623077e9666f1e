"""Smooth approximations for discrete logic, and homotopy scheduling.

Capability parity with reference src/utils/helper.jl: numerically-stable
`logsumexp` (:623-651), `sigmoid` (:672), `indicator` (:724), smooth-`or`
(:775-807), and src/utils/homotopy.jl (exponential continuation schedule,
:22-73). Gradients/Hessians come for free from JAX autodiff — the reference's
hand-written derivative outputs are unnecessary here.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax.numpy as jnp


def logsumexp(f, kappa=1.0):
    """Stable (1/kappa) * log(sum(exp(kappa * f))) (reference helper.jl:623-651).

    With kappa -> inf this approaches max(f) from above; used e.g. for the
    freeflyer's signed-distance-field union over ISS rooms
    (freeflyer/definition.jl:393-401).
    """
    f = jnp.asarray(f)
    z = kappa * f
    m = jnp.max(z, axis=-1, keepdims=True)
    return (m[..., 0] + jnp.log(jnp.sum(jnp.exp(z - m), axis=-1))) / kappa


def sigmoid(x, kappa=1.0):
    """Sharpness-kappa logistic sigmoid (reference helper.jl:672).

    sigmoid(x) -> step(x) as kappa -> inf; stable for large |kappa*x|.
    """
    return 0.5 * (jnp.tanh(0.5 * kappa * jnp.asarray(x)) + 1.0)


def indicator(x, kappa=1.0):
    """Smooth indicator that x >= 0 (reference helper.jl:724), equal to
    sigmoid(x; kappa)."""
    return sigmoid(x, kappa)


def smooth_or(predicates: Sequence, kappa=1.0, *, minval=0.0):
    """Smooth OR of "predicate >= 0" conditions (reference helper.jl:775-807).

    Returns a smooth value that is ~1 when any predicate is satisfied and
    ~`minval` when none are: OR(p) = minval + (1-minval)*sigmoid(max_k p_k)
    with the max taken smoothly via logsumexp. Used for actuator deadbands
    (oscillator) and plume/approach discrete logic (rendezvous problems).
    """
    stacked = jnp.stack([jnp.asarray(p) for p in predicates], axis=-1)
    smooth_max = logsumexp(stacked, kappa)
    return minval + (1.0 - minval) * sigmoid(smooth_max, kappa)


class Homotopy(NamedTuple):
    """Exponential continuation schedule for a sharpness parameter.

    h(x) = log(1/eps - 1) / (rho^x * delta_max): at x=0 the sigmoid transition
    width is delta_max; each unit step of x shrinks it by rho.
    (reference src/utils/homotopy.jl:22-73)
    """

    eps: float = 0.05
    rho: float = 0.5
    delta_max: float = 1.0

    def __call__(self, x):
        x = jnp.asarray(x, dtype=float)
        return jnp.log(1.0 / self.eps - 1.0) / (self.rho**x * self.delta_max)
