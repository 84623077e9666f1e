"""Interpolation kernels on time grids.

Capability parity with reference src/utils/helper.jl: `get_interval` (:84),
`linterp` (:107), `zohinterp` (:135), `diracinterp` (:166),
`straightline_interpolate` (:203). All kernels are branch-free (searchsorted +
gather) so they jit/vmap and run on TPU inside scans.
"""

from __future__ import annotations

import jax.numpy as jnp


def get_interval(t, t_grid) -> jnp.ndarray:
    """Index k such that t_grid[k] <= t < t_grid[k+1], clipped to valid range.

    (reference helper.jl:84)
    """
    k = jnp.searchsorted(t_grid, t, side="right") - 1
    return jnp.clip(k, 0, t_grid.shape[0] - 2)


def linterp(t, f_grid, t_grid) -> jnp.ndarray:
    """Piecewise-linear interpolation of f_grid (shape (N, ...) ) at time t.

    (reference helper.jl:107)
    """
    f_grid = jnp.asarray(f_grid)
    k = get_interval(t, t_grid)
    t0 = t_grid[k]
    t1 = t_grid[k + 1]
    theta = jnp.clip((t - t0) / jnp.maximum(t1 - t0, 1e-300), 0.0, 1.0)
    f0 = f_grid[k]
    f1 = f_grid[k + 1]
    return f0 + theta * (f1 - f0)


def zohinterp(t, f_grid, t_grid) -> jnp.ndarray:
    """Zero-order-hold interpolation: value of the left grid node.

    (reference helper.jl:135)
    """
    f_grid = jnp.asarray(f_grid)
    # right-continuous ZOH; the final node holds the last value
    k = jnp.clip(
        jnp.searchsorted(t_grid, t, side="right") - 1, 0, f_grid.shape[0] - 1
    )
    return f_grid[k]


def diracinterp(t, f_grid, t_grid) -> jnp.ndarray:
    """Impulse-train interpolation: f_grid[k] when t == t_grid[k], else 0.

    (reference helper.jl:166)
    """
    f_grid = jnp.asarray(f_grid)
    hit = jnp.isclose(t, t_grid)
    k = jnp.argmax(hit)
    any_hit = jnp.any(hit)
    return jnp.where(any_hit, f_grid[k], jnp.zeros_like(f_grid[0]))


def straightline_interpolate(v0, vf, N: int) -> jnp.ndarray:
    """(N, dim) matrix of a straight line from v0 to vf (reference helper.jl:203)."""
    v0 = jnp.atleast_1d(jnp.asarray(v0, dtype=float))
    vf = jnp.atleast_1d(jnp.asarray(vf, dtype=float))
    theta = jnp.linspace(0.0, 1.0, N)[:, None]
    return v0[None, :] * (1 - theta) + vf[None, :] * theta
