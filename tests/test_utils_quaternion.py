"""Unit tests for quaternion ops against closed-form rotation identities."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scptoolbox_tpu.utils import quaternion as quat


def rand_quat(key):
    q = jax.random.normal(key, (4,))
    return q / jnp.linalg.norm(q)


def test_identity_rotation():
    q = quat.identity()
    r = jnp.array([1.0, 2.0, 3.0])
    np.testing.assert_allclose(quat.rotate(q, r), r, atol=1e-12)


def test_angleaxis_90deg_z():
    q = quat.from_angleaxis(jnp.pi / 2, jnp.array([0.0, 0.0, 1.0]))
    r = jnp.array([1.0, 0.0, 0.0])
    np.testing.assert_allclose(quat.rotate(q, r), [0.0, 1.0, 0.0], atol=1e-12)


def test_dcm_matches_rotate():
    key = jax.random.PRNGKey(0)
    for k in jax.random.split(key, 5):
        q = rand_quat(k)
        r = jax.random.normal(k, (3,))
        np.testing.assert_allclose(quat.dcm(q) @ r, quat.rotate(q, r), atol=1e-12)


def test_mul_associative_and_skew():
    key = jax.random.PRNGKey(1)
    k1, k2, k3 = jax.random.split(key, 3)
    q, p, s = rand_quat(k1), rand_quat(k2), rand_quat(k3)
    np.testing.assert_allclose(
        quat.mul(quat.mul(q, p), s), quat.mul(q, quat.mul(p, s)), atol=1e-12
    )
    np.testing.assert_allclose(quat.mul(q, p), quat.skew_L(q) @ p, atol=1e-12)
    np.testing.assert_allclose(quat.mul(q, p), quat.skew_R(p) @ q, atol=1e-12)


def test_conj_is_inverse():
    q = rand_quat(jax.random.PRNGKey(2))
    np.testing.assert_allclose(quat.mul(q, quat.conj(q)), quat.identity(), atol=1e-12)


def test_log_roundtrip():
    alpha = 0.7
    axis = jnp.array([1.0, 2.0, -1.0]) / jnp.sqrt(6.0)
    q = quat.from_angleaxis(alpha, axis)
    np.testing.assert_allclose(quat.log(q), alpha * axis, atol=1e-12)
    # identity edge case
    np.testing.assert_allclose(quat.log(quat.identity()), jnp.zeros(3), atol=1e-12)


def test_from_dcm_roundtrip():
    key = jax.random.PRNGKey(3)
    for k in jax.random.split(key, 8):
        q = rand_quat(k)
        q2 = quat.from_dcm(quat.dcm(q))
        # q and -q are the same rotation
        sign = jnp.sign(jnp.dot(q, q2))
        np.testing.assert_allclose(sign * q2, q, atol=1e-8)


def test_rpy_consistency():
    roll, pitch, yaw = 0.2, -0.3, 0.9
    qz = quat.from_angleaxis(yaw, jnp.array([0.0, 0.0, 1.0]))
    qy = quat.from_angleaxis(pitch, jnp.array([0.0, 1.0, 0.0]))
    qx = quat.from_angleaxis(roll, jnp.array([1.0, 0.0, 0.0]))
    q = quat.mul(qz, quat.mul(qy, qx))
    r, p, y = quat.rpy(q)
    np.testing.assert_allclose([r, p, y], [roll, pitch, yaw], atol=1e-12)


def test_slerp_endpoints_and_midpoint():
    q0 = quat.identity()
    q1 = quat.from_angleaxis(1.0, jnp.array([0.0, 0.0, 1.0]))
    np.testing.assert_allclose(quat.slerp(q0, q1, 0.0), q0, atol=1e-12)
    np.testing.assert_allclose(quat.slerp(q0, q1, 1.0), q1, atol=1e-12)
    qm = quat.slerp(q0, q1, 0.5)
    np.testing.assert_allclose(
        qm, quat.from_angleaxis(0.5, jnp.array([0.0, 0.0, 1.0])), atol=1e-12
    )


def test_ddq_matches_autodiff():
    # ddq is the Jacobian of the homogeneous (quadratic-form) rotation
    # R(q) r = (qw^2 - |qv|^2) r + 2 (qv.r) qv + 2 qw (qv x r),
    # which coincides with rotate() on the unit sphere.
    q = rand_quat(jax.random.PRNGKey(4))
    r = jnp.array([0.3, -1.2, 2.0])

    def rot_quadratic(qq):
        qv, qw = qq[:3], qq[3]
        return (
            (qw**2 - jnp.dot(qv, qv)) * r
            + 2.0 * jnp.dot(qv, r) * qv
            + 2.0 * qw * jnp.cross(qv, r)
        )

    np.testing.assert_allclose(rot_quadratic(q), quat.rotate(q, r), atol=1e-12)
    J_auto = jax.jacfwd(rot_quadratic)(q)
    np.testing.assert_allclose(quat.ddq(q, r), J_auto, atol=1e-10)


def test_vmap_and_jit():
    keys = jax.random.split(jax.random.PRNGKey(5), 16)
    qs = jax.vmap(rand_quat)(keys)
    rs = jax.random.normal(jax.random.PRNGKey(6), (16, 3))
    out = jax.jit(jax.vmap(quat.rotate))(qs, rs)
    assert out.shape == (16, 3)
    norms = jnp.linalg.norm(out, axis=-1)
    np.testing.assert_allclose(norms, jnp.linalg.norm(rs, axis=-1), atol=1e-10)
