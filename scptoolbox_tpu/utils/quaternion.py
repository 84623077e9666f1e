"""Scalar-last unit quaternion algebra as pure jnp functions.

Capability parity with reference src/utils/quaternion.jl (struct :33-151, skew
:190-197, product :211-244, Log :277-282, rotate :357-363, dcm :376-379, rpy
:435-440, slerp :483-490, ddq :506-512), redesigned functionally: a quaternion
is a plain `(4,)` jnp array `q = [qx, qy, qz, qw]` (vector part first, scalar
last), so every op vmaps/jits/differentiates freely — no mutable wrapper class.
"""

from __future__ import annotations

import jax.numpy as jnp


def identity(dtype=None) -> jnp.ndarray:
    """Identity (no-rotation) quaternion."""
    return jnp.array([0.0, 0.0, 0.0, 1.0], dtype=dtype or jnp.zeros(0).dtype)


def from_parts(v, w) -> jnp.ndarray:
    """Build [v; w] from vector part v (3,) and scalar part w."""
    v = jnp.asarray(v)
    return jnp.concatenate([v, jnp.reshape(jnp.asarray(w, v.dtype), (1,))])


def vector(q) -> jnp.ndarray:
    """Vector (imaginary) part."""
    return q[..., :3]


def scalar(q):
    """Scalar (real) part."""
    return q[..., 3]


def from_angleaxis(alpha, axis) -> jnp.ndarray:
    """Unit quaternion for rotation of `alpha` radians about unit `axis`.

    (reference quaternion.jl:80-104)
    """
    axis = jnp.asarray(axis)
    axis = axis / jnp.linalg.norm(axis)
    half = 0.5 * alpha
    return from_parts(axis * jnp.sin(half), jnp.cos(half))


def skew_L(q) -> jnp.ndarray:
    """4x4 left-multiplication matrix: quat_mul(q, p) == skew_L(q) @ p.

    (reference quaternion.jl:190-197 `skew(q, :L)`)
    """
    x, y, z, w = q[0], q[1], q[2], q[3]
    return jnp.array(
        [
            [w, -z, y, x],
            [z, w, -x, y],
            [-y, x, w, z],
            [-x, -y, -z, w],
        ]
    )


def skew_R(q) -> jnp.ndarray:
    """4x4 right-multiplication matrix: quat_mul(p, q) == skew_R(q) @ p."""
    x, y, z, w = q[0], q[1], q[2], q[3]
    return jnp.array(
        [
            [w, z, -y, x],
            [-z, w, x, y],
            [y, -x, w, z],
            [-x, -y, -z, w],
        ]
    )


def mul(q, p) -> jnp.ndarray:
    """Hamilton product q*p (reference quaternion.jl:211-244)."""
    qv, qw = q[..., :3], q[..., 3:4]
    pv, pw = p[..., :3], p[..., 3:4]
    v = qw * pv + pw * qv + jnp.cross(qv, pv)
    w = qw * pw - jnp.sum(qv * pv, axis=-1, keepdims=True)
    return jnp.concatenate([v, w], axis=-1)


def conj(q) -> jnp.ndarray:
    """Quaternion conjugate (inverse for unit quaternions)."""
    return jnp.concatenate([-q[..., :3], q[..., 3:4]], axis=-1)


def normalize(q) -> jnp.ndarray:
    """Project onto the unit sphere (used as an RK4 integration action,
    reference problem.jl:296-305)."""
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def log(q) -> jnp.ndarray:
    """Quaternion logarithm: angle*axis (3,) such that q = exp([0.5*angle*axis]).

    Returns the rotation vector alpha*u (reference quaternion.jl:277-282).
    """
    qv = q[..., :3]
    qw = q[..., 3]
    nv = jnp.linalg.norm(qv, axis=-1)
    # guard against nv == 0 (identity rotation)
    safe_nv = jnp.where(nv > 0, nv, 1.0)
    alpha = 2.0 * jnp.arctan2(nv, qw)
    return jnp.where((nv > 0)[..., None], (alpha / safe_nv)[..., None] * qv, jnp.zeros_like(qv))


def rotate(q, r) -> jnp.ndarray:
    """Rotate vector r by quaternion q: q ⊗ [r;0] ⊗ q* (reference :357-363)."""
    qv, qw = q[..., :3], q[..., 3:4]
    t = 2.0 * jnp.cross(qv, r)
    return r + qw * t + jnp.cross(qv, t)


def dcm(q) -> jnp.ndarray:
    """Direction cosine matrix such that dcm(q) @ r == rotate(q, r).

    (reference quaternion.jl:376-379)
    """
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - z * w)
    r02 = 2 * (x * z + y * w)
    r10 = 2 * (x * y + z * w)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - x * w)
    r20 = 2 * (x * z - y * w)
    r21 = 2 * (y * z + x * w)
    r22 = 1 - 2 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def rpy(q):
    """Tait-Bryan roll/pitch/yaw (ZYX intrinsic) angles of the rotation.

    (reference quaternion.jl:435-440)
    """
    R = dcm(q)
    pitch = jnp.arcsin(jnp.clip(-R[..., 2, 0], -1.0, 1.0))
    roll = jnp.arctan2(R[..., 2, 1], R[..., 2, 2])
    yaw = jnp.arctan2(R[..., 1, 0], R[..., 0, 0])
    return roll, pitch, yaw


def slerp(q0, q1, t) -> jnp.ndarray:
    """Spherical linear interpolation from q0 (t=0) to q1 (t=1).

    (reference quaternion.jl:483-490)
    """
    d = jnp.sum(q0 * q1, axis=-1)
    # take the short way around
    q1 = jnp.where(d < 0, -q1, q1)
    d = jnp.abs(d)
    d = jnp.clip(d, -1.0, 1.0)
    theta = jnp.arccos(d)
    sin_theta = jnp.sin(theta)
    # fall back to lerp for nearly-parallel quaternions
    use_lerp = sin_theta < 1e-6
    w0 = jnp.where(use_lerp, 1.0 - t, jnp.sin((1.0 - t) * theta) / jnp.where(use_lerp, 1.0, sin_theta))
    w1 = jnp.where(use_lerp, t, jnp.sin(t * theta) / jnp.where(use_lerp, 1.0, sin_theta))
    return normalize(w0 * q0 + w1 * q1)


def ddq(q, r) -> jnp.ndarray:
    """Jacobian of the homogeneous rotation form wrt q, shape (3, 4).

    Differentiates R(q) r = (qw^2-|qv|^2) r + 2 (qv.r) qv + 2 qw (qv x r),
    which equals rotate(q, r) for unit q (reference quaternion.jl:506-512).
    """
    qv, qw = q[:3], q[3]
    # d/dqv: 2(qv.r I + qv r^T - r qv^T - qw skew(r)); d/dqw: 2(qw r + cross(qv, r))
    rv = jnp.asarray(r)
    I3 = jnp.eye(3, dtype=q.dtype)
    d_dqv = 2.0 * (
        jnp.dot(qv, rv) * I3
        + jnp.outer(qv, rv)
        - jnp.outer(rv, qv)
        - qw * _skew3(rv)
    )
    d_dqw = 2.0 * (qw * rv + jnp.cross(qv, rv))
    return jnp.concatenate([d_dqv, d_dqw[:, None]], axis=1)


def _skew3(v):
    return jnp.array(
        [
            [0.0, -v[2], v[1]],
            [v[2], 0.0, -v[0]],
            [-v[1], v[0], 0.0],
        ]
    )


def from_dcm(R) -> jnp.ndarray:
    """Unit quaternion from a rotation matrix (branch-free Shepperd variant).

    (reference quaternion.jl:118-151)
    """
    R = jnp.asarray(R)
    tr = R[0, 0] + R[1, 1] + R[2, 2]

    def case_w():
        w = jnp.sqrt(jnp.maximum(1.0 + tr, 1e-12)) / 2.0
        return jnp.array(
            [
                (R[2, 1] - R[1, 2]) / (4 * w),
                (R[0, 2] - R[2, 0]) / (4 * w),
                (R[1, 0] - R[0, 1]) / (4 * w),
                w,
            ]
        )

    def case_x():
        x = jnp.sqrt(jnp.maximum(1.0 + R[0, 0] - R[1, 1] - R[2, 2], 1e-12)) / 2.0
        return jnp.array(
            [
                x,
                (R[0, 1] + R[1, 0]) / (4 * x),
                (R[0, 2] + R[2, 0]) / (4 * x),
                (R[2, 1] - R[1, 2]) / (4 * x),
            ]
        )

    def case_y():
        y = jnp.sqrt(jnp.maximum(1.0 - R[0, 0] + R[1, 1] - R[2, 2], 1e-12)) / 2.0
        return jnp.array(
            [
                (R[0, 1] + R[1, 0]) / (4 * y),
                y,
                (R[1, 2] + R[2, 1]) / (4 * y),
                (R[0, 2] - R[2, 0]) / (4 * y),
            ]
        )

    def case_z():
        z = jnp.sqrt(jnp.maximum(1.0 - R[0, 0] - R[1, 1] + R[2, 2], 1e-12)) / 2.0
        return jnp.array(
            [
                (R[0, 2] + R[2, 0]) / (4 * z),
                (R[1, 2] + R[2, 1]) / (4 * z),
                z,
                (R[1, 0] - R[0, 1]) / (4 * z),
            ]
        )

    diag = jnp.array([R[0, 0], R[1, 1], R[2, 2]])
    use_w = tr > jnp.max(diag)
    idx = jnp.where(use_w, 3, jnp.argmax(diag))
    import jax

    q = jax.lax.switch(idx, [case_x, case_y, case_z, case_w])
    return normalize(q)
