"""Unit tests for interp/integrate/smooth/search/linsys/geometry utilities."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.scipy.linalg import expm

from scptoolbox_tpu.utils import (
    Ellipsoid,
    Homotopy,
    Hyperrectangle,
    c2d_foh,
    c2d_zoh,
    golden,
    grad_trapz,
    homdisp,
    hominv,
    homrot,
    homtransf,
    linterp,
    logsumexp,
    rk4,
    sigmoid,
    skew,
    smooth_or,
    straightline_interpolate,
    trapz,
    zohinterp,
)
from scptoolbox_tpu.utils.trajectory import ContinuousTimeTrajectory, sample


def test_skew():
    a = jnp.array([1.0, 2.0, 3.0])
    b = jnp.array([-2.0, 0.5, 4.0])
    np.testing.assert_allclose(skew(a) @ b, jnp.cross(a, b), atol=1e-14)


def test_linterp_zoh():
    t = jnp.array([0.0, 1.0, 2.0])
    f = jnp.array([[0.0, 0.0], [2.0, 4.0], [4.0, 0.0]])
    np.testing.assert_allclose(linterp(0.5, f, t), [1.0, 2.0])
    np.testing.assert_allclose(linterp(1.5, f, t), [3.0, 2.0])
    np.testing.assert_allclose(zohinterp(0.99, f, t), [0.0, 0.0])
    np.testing.assert_allclose(zohinterp(1.0, f, t), [2.0, 4.0])
    # endpoints clamp
    np.testing.assert_allclose(linterp(2.5, f, t), [4.0, 0.0])


def test_straightline():
    X = straightline_interpolate(jnp.zeros(2), jnp.array([2.0, -2.0]), 5)
    assert X.shape == (5, 2)
    np.testing.assert_allclose(X[2], [1.0, -1.0])


def test_rk4_exponential_decay():
    # dx/dt = -x => x(1) = exp(-1)
    xf = rk4(lambda t, x: -x, jnp.array([1.0]), jnp.linspace(0, 1, 51))
    np.testing.assert_allclose(xf, [np.exp(-1)], rtol=1e-7)


def test_rk4_actions_renormalize():
    # integrate a rotation quaternion and keep it unit via action
    from scptoolbox_tpu.utils import quaternion as quat

    w = jnp.array([0.0, 0.0, 1.0])

    def f(t, q):
        return 0.5 * quat.mul(q, jnp.concatenate([w, jnp.zeros(1)]))

    qf = rk4(f, quat.identity(), jnp.linspace(0, jnp.pi / 2, 101), actions=quat.normalize)
    expected = quat.from_angleaxis(jnp.pi / 2, jnp.array([0.0, 0.0, 1.0]))
    np.testing.assert_allclose(qf, expected, atol=1e-6)
    np.testing.assert_allclose(jnp.linalg.norm(qf), 1.0, atol=1e-12)


def test_rk4_full_trajectory():
    ts = jnp.linspace(0, 1, 11)
    xs = rk4(lambda t, x: -x, jnp.array([1.0]), ts, full=True)
    assert xs.shape == (11, 1)
    np.testing.assert_allclose(xs[-1], [np.exp(-1)], rtol=1e-5)


def test_trapz_and_grad():
    t = jnp.linspace(0, 1, 101)
    f = t**2
    np.testing.assert_allclose(trapz(f, t), 1 / 3, atol=1e-4)
    w = grad_trapz(t)
    np.testing.assert_allclose(jnp.dot(w, f), trapz(f, t), atol=1e-12)


def test_logsumexp_approaches_max():
    f = jnp.array([1.0, 3.0, -2.0])
    assert logsumexp(f, 100.0) == np.testing.assert_allclose(
        logsumexp(f, 100.0), 3.0, atol=1e-2
    ) or True
    # stability at huge kappa
    assert np.isfinite(float(logsumexp(f, 1e6)))


def test_sigmoid_and_smooth_or():
    assert float(sigmoid(10.0, 10.0)) > 0.99
    assert float(sigmoid(-10.0, 10.0)) < 0.01
    v = smooth_or([jnp.array(5.0), jnp.array(-5.0)], kappa=10.0)
    assert float(v) > 0.99
    v = smooth_or([jnp.array(-5.0), jnp.array(-5.0)], kappa=10.0)
    assert float(v) < 0.01


def test_homotopy_schedule():
    h = Homotopy(delta_min=0.5, delta_max=1.0, eps=0.05)
    assert float(h(1.0)) > float(h(0.0)) > 0  # sharpness grows
    # reference parameterization (homotopy.jl:70-73): h(x) scales as rho^-x
    h8 = Homotopy(delta_min=1e-8)
    assert float(h8(0.0)) == pytest.approx(np.log(99.0), rel=1e-9)
    assert float(h8(1.0)) == pytest.approx(np.log(99.0) * 1e8, rel=1e-6)


def test_smooth_or_match():
    """With match=normalize=m, OR equals exactly 1 when a predicate hits m
    (reference or(), helper.jl:775-807)."""
    m = 0.25
    v = smooth_or([jnp.array(m), jnp.array(-m - 0.1)], kappa=10.0,
                  match=m, normalize=m)
    assert float(v) == pytest.approx(1.0, abs=1e-6)


def test_golden():
    x, y = golden(lambda x: (x - 1.7) ** 2 + 0.3, 0.0, 5.0, tol=1e-6)
    assert abs(x - 1.7) < 1e-5
    assert abs(y - 0.3) < 1e-9


def test_c2d_zoh_double_integrator():
    A = jnp.array([[0.0, 1.0], [0.0, 0.0]])
    B = jnp.array([[0.0], [1.0]])
    dt = 0.3
    Ad, Bd = c2d_zoh(A, B, dt)
    np.testing.assert_allclose(Ad, [[1.0, dt], [0.0, 1.0]], atol=1e-12)
    np.testing.assert_allclose(Bd, [[dt**2 / 2], [dt]], atol=1e-12)


def test_c2d_foh_reconstructs_linear_input():
    # For x' = Ax + Bu with u linear on [0,dt], FOH discretization is exact.
    A = jnp.array([[-0.3, 1.0], [0.2, -0.5]])
    B = jnp.array([[0.5], [1.0]])
    dt = 0.7
    Ad, Bm, Bp = c2d_foh(A, B, dt)
    u0, u1 = jnp.array([0.8]), jnp.array([-0.4])
    x0 = jnp.array([1.0, -2.0])

    def f(t, x):
        u = u0 + (u1 - u0) * (t / dt)
        return A @ x + B @ u

    x_true = rk4(f, x0, jnp.linspace(0, dt, 2001))
    x_disc = Ad @ x0 + Bm @ u0 + Bp @ u1
    np.testing.assert_allclose(x_disc, x_true, rtol=1e-7, atol=1e-9)


def test_ellipsoid():
    E = Ellipsoid.from_radii(jnp.array([2.0, 1.0]), jnp.array([1.0, 0.0]))
    np.testing.assert_allclose(E(jnp.array([3.0, 0.0])), 1.0, atol=1e-12)
    np.testing.assert_allclose(E(jnp.array([1.0, 0.5])), 0.5, atol=1e-12)
    g_auto = jax.grad(lambda r: E(r))(jnp.array([3.0, 1.0]))
    np.testing.assert_allclose(E.grad(jnp.array([3.0, 1.0])), g_auto, atol=1e-10)


def test_ellipsoid_project():
    H = jnp.array([[1.0, 0.3, 0.0], [0.0, 0.8, 0.1], [0.2, 0.0, 0.5]])
    E = Ellipsoid(H, jnp.zeros(3))
    Ep = E.project([0, 1])
    # Boundary of projection: maximize x0 over the ellipsoid, check consistency
    # by sampling: all points of the 3D ellipsoid project inside Ep.
    key = jax.random.PRNGKey(0)
    pts = jax.random.normal(key, (200, 3))
    pts = pts / jnp.linalg.norm(pts, axis=1, keepdims=True)
    xs = jnp.linalg.solve(H, pts.T).T  # boundary points of E
    vals = jax.vmap(lambda x: Ep(x[:2]))(xs)
    assert float(jnp.max(vals)) <= 1.0 + 1e-9


def test_hyperrectangle():
    box = Hyperrectangle.from_ranges((-1.0, 2.0), (0.0, 4.0))
    assert bool(box.contains(jnp.array([0.0, 1.0])))
    assert not bool(box.contains(jnp.array([3.0, 1.0])))
    np.testing.assert_allclose(box.s, [1.5, 2.0])
    np.testing.assert_allclose(box.center, [0.5, 2.0])


def test_homtransf():
    from scptoolbox_tpu.utils import quaternion as quat

    R = quat.dcm(quat.from_angleaxis(0.4, jnp.array([0.0, 0.0, 1.0])))
    t = jnp.array([1.0, -2.0, 0.5])
    T = homtransf(R, t)
    np.testing.assert_allclose(homrot(T), R)
    np.testing.assert_allclose(homdisp(T), t)
    np.testing.assert_allclose(T @ hominv(T), jnp.eye(4), atol=1e-12)


def test_trajectory_sampling():
    t = jnp.array([0.0, 1.0, 2.0])
    x = jnp.array([[0.0], [2.0], [4.0]])
    traj = ContinuousTimeTrajectory(t, x, "linear")
    np.testing.assert_allclose(sample(traj, 0.5), [1.0])
    traj_zoh = ContinuousTimeTrajectory(t, x, "zoh")
    np.testing.assert_allclose(sample(traj_zoh, 0.5), [0.0])
    traj_imp = ContinuousTimeTrajectory(t, x, "impulse")
    np.testing.assert_allclose(sample(traj_imp, 1.0), [2.0])
    np.testing.assert_allclose(sample(traj_imp, 0.5), [0.0])
