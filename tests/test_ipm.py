"""Tests for the native conic interior-point solver (ops/ipm.py).

The reference treats its solver (ECOS) as an external trusted component; we
implement it, so it gets real unit tests: scipy.linprog as the LP oracle,
randomly constructed primal-dual optimal pairs as the SOCP oracle (strong
duality by construction), plus infeasibility-certificate and batching tests.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.optimize import linprog

from scptoolbox_tpu.ops import cones as cn
from scptoolbox_tpu.ops import ipm
from scptoolbox_tpu.ops.cones import ConeSpec
from scptoolbox_tpu.ops.ipm import IPMStatus


def random_bounded_lp(rng, n=8, m=20):
    """Feasible bounded LP: min c'x s.t. Ax <= b (c in row space w/ y>=0)."""
    A = rng.standard_normal((m, n))
    x0 = rng.standard_normal(n)
    b = A @ x0 + np.abs(rng.standard_normal(m)) + 0.1
    y = np.abs(rng.standard_normal(m))
    c = -A.T @ y  # c'x = -y'Ax >= -y'b on {Ax<=b}: bounded below
    return A, b, c


@pytest.mark.parametrize("seed", range(5))
def test_lp_against_scipy(seed):
    rng = np.random.default_rng(seed)
    A, b, c = random_bounded_lp(rng)
    spec = ConeSpec(nz=0, nl=len(b), socs=())
    sol = ipm.solve(jnp.asarray(A), jnp.asarray(b), jnp.asarray(c), spec)
    ref = linprog(c, A_ub=A, b_ub=b, bounds=(None, None), method="highs")
    assert ref.status == 0
    assert int(sol.status) == IPMStatus.OPTIMAL, (sol.status, sol.pres, sol.dres)
    np.testing.assert_allclose(float(sol.obj), ref.fun, rtol=1e-6, atol=1e-6)
    # primal feasibility of our x
    assert np.max(A @ np.asarray(sol.x) - b) < 1e-6


@pytest.mark.parametrize("seed", range(3))
def test_lp_with_equalities(seed):
    rng = np.random.default_rng(100 + seed)
    n, me, mi = 10, 3, 25
    E = rng.standard_normal((me, n))
    A, b, c = random_bounded_lp(rng, n=n, m=mi)
    x_feas = rng.standard_normal(n)
    b = A @ x_feas + np.abs(rng.standard_normal(mi)) + 0.1
    d = E @ x_feas
    # stack: zero-cone rows first, then nonneg
    G = np.vstack([E, A])
    h = np.concatenate([d, b])
    spec = ConeSpec(nz=me, nl=mi, socs=())
    sol = ipm.solve(jnp.asarray(G), jnp.asarray(h), jnp.asarray(c), spec)
    ref = linprog(c, A_ub=A, b_ub=b, A_eq=E, b_eq=d, bounds=(None, None),
                  method="highs")
    assert ref.status == 0
    assert int(sol.status) == IPMStatus.OPTIMAL, (sol.pres, sol.dres, sol.gap)
    np.testing.assert_allclose(float(sol.obj), ref.fun, rtol=1e-6, atol=1e-6)
    assert np.max(np.abs(E @ np.asarray(sol.x) - d)) < 1e-6


def constructed_socp(rng, n=12, spec=None):
    """Build (A, b, c) with a KNOWN optimal primal-dual pair via strong
    duality: choose complementary (s*, z*) per cone block, x* free, then
    b = A x* + s*, c = -A' z*; optimum value is c'x*."""
    if spec is None:
        spec = ConeSpec(nz=2, nl=6, socs=(3, 4))
    m = spec.m
    A = rng.standard_normal((m, n))
    x_star = rng.standard_normal(n)
    s_star = np.zeros(m)
    z_star = np.zeros(m)
    # zero rows: s=0, z free
    z_star[: spec.nz] = rng.standard_normal(spec.nz)
    # nonneg rows: strict complementarity, random split
    for i in range(spec.nz, spec.nz + spec.nl):
        if rng.random() < 0.5:
            s_star[i] = abs(rng.standard_normal()) + 0.2
        else:
            z_star[i] = abs(rng.standard_normal()) + 0.2
    # SOC blocks: either s interior & z=0, z interior & s=0, or boundary pair
    off = spec.nz + spec.nl
    for d in spec.socs:
        r = rng.random()
        v = rng.standard_normal(d - 1)
        v /= np.linalg.norm(v)
        a = abs(rng.standard_normal()) + 0.3
        if r < 1 / 3:
            s_star[off] = a + abs(rng.standard_normal())
            s_star[off + 1 : off + d] = a * v * 0.5
        elif r < 2 / 3:
            z_star[off] = a + abs(rng.standard_normal())
            z_star[off + 1 : off + d] = a * v * 0.5
        else:  # complementary boundary rays: s=(a, a v), z=(g, -g v)
            g = abs(rng.standard_normal()) + 0.3
            s_star[off] = a
            s_star[off + 1 : off + d] = a * v
            z_star[off] = g
            z_star[off + 1 : off + d] = -g * v
        off += d
    b = A @ x_star + s_star
    c = -A.T @ z_star
    return A, b, c, x_star, s_star, z_star, spec


@pytest.mark.parametrize("seed", range(6))
def test_socp_constructed_optimum(seed):
    rng = np.random.default_rng(200 + seed)
    A, b, c, x_star, s_star, z_star, spec = constructed_socp(rng)
    sol = ipm.solve(jnp.asarray(A), jnp.asarray(b), jnp.asarray(c), spec)
    assert int(sol.status) == IPMStatus.OPTIMAL, (sol.pres, sol.dres, sol.gap)
    np.testing.assert_allclose(float(sol.obj), c @ x_star, rtol=1e-6, atol=1e-6)
    # dual solution certifies optimality: A'z + c = 0, z in K*
    z = np.asarray(sol.z)
    assert np.max(np.abs(A.T @ z + c)) < 1e-6
    # z in K*: free on zero rows (dual of {0}), in K on the symmetric part
    z_cone = z * spec.cone_mask()
    assert float(cn.violation(spec, jnp.asarray(z_cone))) < 1e-6


def test_primal_infeasible_lp():
    # x >= 1 and x <= 0: -x <= -1, x <= 0
    A = jnp.asarray([[-1.0], [1.0]])
    b = jnp.asarray([-1.0, 0.0])
    c = jnp.asarray([1.0])
    spec = ConeSpec(nz=0, nl=2, socs=())
    sol = ipm.solve(A, b, c, spec)
    assert int(sol.status) == IPMStatus.PRIMAL_INFEASIBLE, (
        int(sol.status), float(sol.pres), float(sol.tau), float(sol.kappa))


def test_dual_infeasible_lp():
    # min -x s.t. x >= 0  (unbounded below)
    A = jnp.asarray([[-1.0]])
    b = jnp.asarray([0.0])
    c = jnp.asarray([-1.0])
    spec = ConeSpec(nz=0, nl=1, socs=())
    sol = ipm.solve(A, b, c, spec)
    assert int(sol.status) == IPMStatus.DUAL_INFEASIBLE, int(sol.status)


def test_min_norm_socp_analytic():
    """min t s.t. ||x - p||_2 <= t  -> optimum t*=0 at x=p (epigraph SOC)."""
    p = jnp.asarray([1.0, -2.0, 3.0])
    n = 4  # vars: (t, x1..x3)
    # SOC row block: s = (t, x - p) in SOC(4) => A u + s = b with
    # s0 = t -> A row (-1,0,0,0), b=0 ; s_i = x_i - p_i -> A (0,-e_i), b=-p_i
    A = jnp.asarray([
        [-1.0, 0.0, 0.0, 0.0],
        [0.0, -1.0, 0.0, 0.0],
        [0.0, 0.0, -1.0, 0.0],
        [0.0, 0.0, 0.0, -1.0],
    ])
    b = jnp.concatenate([jnp.zeros(1), -p])
    c = jnp.asarray([1.0, 0.0, 0.0, 0.0])
    spec = ConeSpec(nz=0, nl=0, socs=(4,))
    sol = ipm.solve(A, b, c, spec)
    assert int(sol.status) == IPMStatus.OPTIMAL
    assert abs(float(sol.obj)) < 1e-6
    np.testing.assert_allclose(np.asarray(sol.x)[1:], np.asarray(p), atol=1e-5)


def test_batched_matches_sequential():
    rng = np.random.default_rng(42)
    spec = ConeSpec(nz=1, nl=5, socs=(3,))
    batch = []
    for _ in range(4):
        A, b, c, x_star, *_ , sp = constructed_socp(rng, n=7, spec=spec)
        batch.append((A, b, c, c @ x_star))
    As = jnp.asarray(np.stack([t[0] for t in batch]))
    bs = jnp.asarray(np.stack([t[1] for t in batch]))
    cs = jnp.asarray(np.stack([t[2] for t in batch]))
    sols = ipm.solve_batched(As, bs, cs, spec)
    assert np.all(np.asarray(sols.status) == IPMStatus.OPTIMAL)
    for i, (_, _, _, obj_star) in enumerate(batch):
        np.testing.assert_allclose(float(sols.obj[i]), obj_star, rtol=1e-6,
                                   atol=1e-6)


def test_jit_cache_reuse_across_data():
    """Same spec + shapes must not retrace (one compilation, many solves)."""
    rng = np.random.default_rng(7)
    spec = ConeSpec(nz=0, nl=20, socs=())
    A1, b1, c1 = random_bounded_lp(rng)
    A2, b2, c2 = random_bounded_lp(rng)
    s1 = ipm.solve(jnp.asarray(A1), jnp.asarray(b1), jnp.asarray(c1), spec)
    s2 = ipm.solve(jnp.asarray(A2), jnp.asarray(b2), jnp.asarray(c2), spec)
    assert int(s1.status) == IPMStatus.OPTIMAL
    assert int(s2.status) == IPMStatus.OPTIMAL
