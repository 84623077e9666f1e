"""Geometric sets and rigid-body transform helpers.

Capability parity with reference src/utils/ellipsoid.jl, hyperrectangle.jl and
the homogeneous-transform helpers in src/utils/helper.jl:873-943 — redesigned
as immutable pytree dataclasses of jnp arrays so they flow through jit/vmap.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


def skew(v) -> jnp.ndarray:
    """3x3 cross-product (skew-symmetric) matrix (reference helper.jl:65)."""
    v = jnp.asarray(v)
    z = jnp.zeros((), v.dtype)
    return jnp.array(
        [
            [z, -v[2], v[1]],
            [v[2], z, -v[0]],
            [-v[1], v[0], z],
        ]
    )


class Ellipsoid(NamedTuple):
    """Ellipsoid set {x : ||H (x - c)|| <= 1} (reference ellipsoid.jl:27-51).

    Used as keep-out-zone obstacles by the quadrotor/freeflyer problems.
    `H` is the shape matrix, `c` the center.
    """

    H: jnp.ndarray  # (n, n)
    c: jnp.ndarray  # (n,)

    @staticmethod
    def from_radii(radii, center) -> "Ellipsoid":
        """Axis-aligned ellipsoid with the given semi-axis lengths."""
        radii = jnp.asarray(radii)
        return Ellipsoid(jnp.diag(1.0 / radii), jnp.asarray(center))

    def __call__(self, r) -> jnp.ndarray:
        """Level-set value ||H (r - c)|| (reference ellipsoid.jl:99-102)."""
        return jnp.linalg.norm(self.H @ (jnp.asarray(r) - self.c))

    def grad(self, r) -> jnp.ndarray:
        """Gradient of the level-set value (reference ellipsoid.jl:115-118)."""
        d = jnp.asarray(r) - self.c
        HtH = self.H.T @ self.H
        val = jnp.sqrt(d @ HtH @ d)
        return (HtH @ d) / jnp.maximum(val, 1e-12)

    def project(self, axes) -> "Ellipsoid":
        """Project onto coordinate `axes` via SVD (reference ellipsoid.jl:65-84)."""
        axes = list(axes)
        # The projection of {x: ||H(x-c)||<=1} onto coords I is the ellipsoid
        # with shape matrix derived from the Schur complement of H^T H.
        M = self.H.T @ self.H
        n = self.c.shape[0]
        others = [i for i in range(n) if i not in axes]
        A = M[jnp.ix_(jnp.array(axes), jnp.array(axes))]
        if others:
            B = M[jnp.ix_(jnp.array(axes), jnp.array(others))]
            C = M[jnp.ix_(jnp.array(others), jnp.array(others))]
            S = A - B @ jnp.linalg.solve(C, B.T)
        else:
            S = A
        # S = Hp^T Hp with Hp symmetric PSD square root
        w, V = jnp.linalg.eigh(S)
        Hp = (V * jnp.sqrt(jnp.maximum(w, 0.0))) @ V.T
        return Ellipsoid(Hp, self.c[jnp.array(axes)])


class Hyperrectangle(NamedTuple):
    """Axis-aligned box {x : l <= x <= u} (reference hyperrectangle.jl:26-149).

    Also provides the derived affine scaling (s = (u-l)/2, c = (u+l)/2) used
    for variable normalization.
    """

    l: jnp.ndarray
    u: jnp.ndarray

    @staticmethod
    def from_ranges(*ranges) -> "Hyperrectangle":
        lo = jnp.array([r[0] for r in ranges], dtype=float)
        hi = jnp.array([r[1] for r in ranges], dtype=float)
        return Hyperrectangle(lo, hi)

    @staticmethod
    def from_extrusion(offset, width, height, depth, *, yaw=0.0, pitch=0.0,
                       roll=0.0) -> "Hyperrectangle":
        """Extruded 3D prism: a width x height rectangle at `offset` extruded
        by `depth` along +z, then rotated by Tait-Bryan angles (degrees, each
        a multiple of 90 so the result stays axis-aligned). Reference
        hyperrectangle.jl:102-148."""
        for ang in (yaw, pitch, roll):
            if ang % 90 != 0:
                raise ValueError("hyperrectangle must be axis-aligned")
        import numpy as _np

        lo = _np.array([-width / 2.0, -height / 2.0, 0.0])
        hi = _np.array([width / 2.0, height / 2.0, depth])
        c, s = lambda a: _np.cos(_np.deg2rad(a)), lambda a: _np.sin(
            _np.deg2rad(a))
        Rz = _np.array([[c(yaw), -s(yaw), 0], [s(yaw), c(yaw), 0], [0, 0, 1]])
        Ry = _np.array([[c(pitch), 0, s(pitch)], [0, 1, 0],
                        [-s(pitch), 0, c(pitch)]])
        Rx = _np.array([[1, 0, 0], [0, c(roll), -s(roll)],
                        [0, s(roll), c(roll)]])
        R = Rz @ Ry @ Rx
        lr, ur = R @ lo, R @ hi
        off = _np.asarray(offset, dtype=float)
        return Hyperrectangle(jnp.asarray(_np.minimum(lr, ur) + off),
                              jnp.asarray(_np.maximum(lr, ur) + off))

    @property
    def s(self) -> jnp.ndarray:
        return (self.u - self.l) / 2.0

    @property
    def center(self) -> jnp.ndarray:
        return (self.u + self.l) / 2.0

    def contains(self, x) -> jnp.ndarray:
        """Membership test (reference hyperrectangle.jl:163-165)."""
        x = jnp.asarray(x)
        return jnp.all((x >= self.l) & (x <= self.u))


def homtransf(R=None, t=None, *, dtype=None) -> jnp.ndarray:
    """4x4 homogeneous transform from rotation R (3,3) and translation t (3,).

    (reference helper.jl:873-905)
    """
    if R is None:
        R = jnp.eye(3, dtype=dtype or jnp.zeros(0).dtype)
    R = jnp.asarray(R)
    if t is None:
        t = jnp.zeros(3, R.dtype)
    t = jnp.asarray(t)
    top = jnp.concatenate([R, t[:, None]], axis=1)
    bottom = jnp.array([[0.0, 0.0, 0.0, 1.0]], dtype=top.dtype)
    return jnp.concatenate([top, bottom], axis=0)


def hominv(T) -> jnp.ndarray:
    """Inverse of a homogeneous transform (reference helper.jl:907-918)."""
    R = T[:3, :3]
    t = T[:3, 3]
    return homtransf(R.T, -R.T @ t)


def homdisp(T) -> jnp.ndarray:
    """Translation part (reference helper.jl:920-930)."""
    return T[:3, 3]


def homrot(T) -> jnp.ndarray:
    """Rotation part (reference helper.jl:932-943)."""
    return T[:3, :3]
