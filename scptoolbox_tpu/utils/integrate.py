"""Numerical integration: RK4 under lax.scan, trapezoid rules.

Capability parity with reference src/utils/helper.jl `rk4`/`rk4_generic`/
`rk4_core_step` (:350-501, including per-step state "actions" such as
quaternion renormalization) and `trapz`/`grad trapz` (:560-591). TPU-first:
the time loop is a `lax.scan` so the whole propagation is one fused XLA
program; the integrand `f(t, x)` is traced once.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def rk4_step(f: Callable, x, t, dt):
    """One classical RK4 step for dx/dt = f(t, x) (reference helper.jl:411-449).

    `x` may be any pytree (e.g. the variational-state NamedTuple used by
    ops/discretize.py); stage arithmetic is tree-mapped.
    """
    axpy = lambda a, y, z: jax.tree_util.tree_map(lambda l, m: a * l + m, y, z)
    k1 = f(t, x)
    k2 = f(t + dt / 2, axpy(dt / 2, k1, x))
    k3 = f(t + dt / 2, axpy(dt / 2, k2, x))
    k4 = f(t + dt, axpy(dt, k3, x))
    ksum = jax.tree_util.tree_map(
        lambda a, b, c, d: a + 2 * b + 2 * c + d, k1, k2, k3, k4
    )
    return axpy(dt / 6.0, ksum, x)


def rk4(
    f: Callable,
    x0,
    t_grid,
    actions: Optional[Callable] = None,
    full: bool = False,
):
    """Integrate dx/dt = f(t, x) across `t_grid` with RK4 (`lax.scan`).

    Args:
      f: right-hand side, `f(t, x) -> dx/dt`. `x` may be any pytree whose
         leaves support arithmetic (typically one jnp vector).
      x0: initial state at t_grid[0].
      t_grid: (M,) strictly increasing times.
      actions: optional post-step fixup `actions(x) -> x` applied after every
         RK4 step — the TPU equivalent of the reference's
         SpecialIntegrationActions (helper.jl:488-497), e.g. quaternion
         renormalization.
      full: if True return the whole (M, ...) trajectory, else the final state.

    (reference helper.jl:350-501)
    """
    t_grid = jnp.asarray(t_grid)
    t0s = t_grid[:-1]
    dts = t_grid[1:] - t_grid[:-1]

    def body(x, td):
        t, dt = td
        x_new = rk4_step(f, x, t, dt)
        if actions is not None:
            x_new = actions(x_new)
        return x_new, (x_new if full else None)

    x_last, xs = jax.lax.scan(body, x0, (t0s, dts))
    if full:
        return jax.tree_util.tree_map(
            lambda first, rest: jnp.concatenate([first[None], rest], axis=0), x0, xs
        )
    return x_last


def rk4_grid(f: Callable, x0, t0, t1, nsub: int, actions=None, full: bool = False):
    """RK4 over `nsub` equal substeps on [t0, t1]."""
    t_grid = jnp.linspace(t0, t1, nsub + 1)
    return rk4(f, x0, t_grid, actions=actions, full=full)


def trapz(f_grid, t_grid) -> jnp.ndarray:
    """Trapezoidal quadrature of samples f_grid over t_grid (reference helper.jl:560)."""
    f_grid = jnp.asarray(f_grid)
    dt = jnp.asarray(t_grid)[1:] - jnp.asarray(t_grid)[:-1]
    mid = (f_grid[1:] + f_grid[:-1]) / 2.0
    if mid.ndim > 1:
        dt = dt.reshape((-1,) + (1,) * (mid.ndim - 1))
    return jnp.sum(mid * dt, axis=0)


def grad_trapz(t_grid) -> jnp.ndarray:
    """Gradient of trapz wrt the sample values: the quadrature weights (N,).

    (reference helper.jl:591 `∇trapz`)
    """
    t_grid = jnp.asarray(t_grid)
    dt = t_grid[1:] - t_grid[:-1]
    w = jnp.zeros(t_grid.shape[0], t_grid.dtype)
    w = w.at[:-1].add(dt / 2.0)
    w = w.at[1:].add(dt / 2.0)
    return w
