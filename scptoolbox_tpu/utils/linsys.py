"""Linear-system discretization via matrix exponentials.

Capability parity with reference src/utils/helper.jl `c2d` (:248-265, exact
ZOH) and the FOH matrix-exponential integrals used by the double-integrator
example (double_integrator/parameters.jl:70-78), plus `expm_diff` (:532).
Uses jax.scipy.linalg.expm (works on TPU; squaring-and-scaling maps to MXU
matmuls).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.scipy.linalg import expm


def c2d_zoh(A, B, dt) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact zero-order-hold discretization of dx/dt = A x + B u.

    Returns (Ad, Bd) with x+ = Ad x + Bd u via the block-matrix exponential
    exp([[A, B], [0, 0]] dt) (reference helper.jl:248-265).
    """
    A = jnp.asarray(A, dtype=float)
    B = jnp.asarray(B, dtype=float)
    n, m = A.shape[0], B.shape[1]
    M = jnp.zeros((n + m, n + m), A.dtype)
    M = M.at[:n, :n].set(A)
    M = M.at[:n, n:].set(B)
    E = expm(M * dt)
    return E[:n, :n], E[:n, n:]


def c2d_foh(A, B, dt) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Exact first-order-hold discretization of dx/dt = A x + B u.

    Returns (Ad, Bm, Bp) with x+ = Ad x + Bm u_k + Bp u_{k+1}, where the input
    is linearly interpolated on the interval. Computed from the augmented
    exponential exp([[A,B,0],[0,0,I/dt],[0,0,0]] dt): Bm = I1 - I2/dt-part,
    matching the reference example's integral construction
    (double_integrator/parameters.jl:70-78).
    """
    A = jnp.asarray(A, dtype=float)
    B = jnp.asarray(B, dtype=float)
    n, m = A.shape[0], B.shape[1]
    M = jnp.zeros((n + 2 * m, n + 2 * m), A.dtype)
    M = M.at[:n, :n].set(A)
    M = M.at[:n, n : n + m].set(B)
    M = M.at[n : n + m, n + m :].set(jnp.eye(m, dtype=A.dtype) / dt)
    E = expm(M * dt)
    Ad = E[:n, :n]
    I1 = E[:n, n : n + m]  # = int_0^dt exp(A(dt-s)) B ds
    I2 = E[:n, n + m :]  # = int_0^dt exp(A(dt-s)) B (s/dt) ds
    Bp = I2
    Bm = I1 - I2
    return Ad, Bm, Bp


def expm_diff(A, dA, t=1.0) -> jnp.ndarray:
    """Directional derivative of the matrix exponential: d/deps expm((A+eps*dA)t).

    Via jax.jvp on expm (reference helper.jl:532 computes this with a
    block-augmented integral; forward-mode AD is the native equivalent).
    """
    _, tangent = jax.jvp(lambda M: expm(M * t), (jnp.asarray(A, dtype=float),), (jnp.asarray(dA, dtype=float),))
    return tangent
