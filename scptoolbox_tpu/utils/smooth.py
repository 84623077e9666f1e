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


def smooth_or(predicates: Sequence, kappa=1.0, *, match=None, normalize=1.0):
    """Smooth OR of "predicate >= 0" conditions (reference helper.jl:775-807
    `or` -> `indicator` :724 -> `sigmoid` :672).

    OR(p) = sigmoid(smoothmax(p / normalize)) + shift, where smoothmax is
    logsumexp at sharpness kappa and the optional `match` y-shifts the curve
    so OR equals exactly 1 when a predicate reaches `match` (the value the
    exact kappa=inf indicator would give). `normalize` makes the shape
    invariant to uniform predicate scaling. Used for actuator deadbands
    (oscillator definition.jl:370-440) and plume/approach discrete logic
    (rendezvous problems). Gradients come from JAX AD (the reference
    hand-writes them)."""
    stacked = jnp.stack([jnp.asarray(p) for p in predicates], axis=-1)
    smooth_max = logsumexp(stacked / normalize, kappa)
    val = sigmoid(smooth_max, kappa)
    if match is not None:
        m = jnp.atleast_1d(jnp.asarray(match, dtype=float)) / normalize
        val = val + 1.0 - sigmoid(logsumexp(m, kappa), kappa)
    return val


class Homotopy(NamedTuple):
    """Exponential continuation schedule for a sharpness parameter
    (reference src/utils/homotopy.jl:22-73).

    h(x) = log(1/eps - 1) / (rho^x * delta_max) with rho = delta_min /
    delta_max: at x=0 the sigmoid transition half-width is delta_max
    (smoothest); at x=1 it is delta_min (sharpest). `eps` is the y-error
    versus the exact step function at the transition edge.
    """

    delta_min: float = 1e-8
    delta_max: float = 1.0
    eps: float = 1e-2

    @property
    def rho(self) -> float:
        return self.delta_min / self.delta_max

    def __call__(self, x):
        x = jnp.asarray(x, dtype=float)
        return jnp.log(1.0 / self.eps - 1.0) / (self.rho**x * self.delta_max)
