"""Pallas KKT kernel tests (interpret mode on CPU; the same code compiles
via Mosaic on TPU). Covers odd sizes below/above the 128 lane width,
batched/vmapped dispatch, vector and matrix right-hand sides, and the f32
_SchurKKT path with the Pallas kernels toggled on — the production TPU f32
configuration (ADVICE r1: kernels were previously untested in CI)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scptoolbox_tpu.ops import pallas_kernels as pk


def _spd(rng, n, dtype=np.float64):
    A = rng.standard_normal((n, n))
    return jnp.asarray(A @ A.T + n * np.eye(n), dtype)


@pytest.mark.parametrize("n", [1, 2, 3, 7, 17, 64, 127, 128, 129, 200, 257])
def test_cholesky_matches_xla(n):
    rng = np.random.default_rng(n)
    H = _spd(rng, n)
    L = pk.cholesky(H, interpret=True)
    L_ref = jnp.linalg.cholesky(H)
    np.testing.assert_allclose(np.asarray(L), np.asarray(L_ref),
                               rtol=1e-10, atol=1e-10)


@pytest.mark.parametrize("n,k", [(5, 1), (13, 4), (129, 3), (64, 130)])
def test_cho_solve_matrix_rhs(n, k):
    rng = np.random.default_rng(n * 1000 + k)
    H = _spd(rng, n)
    B = jnp.asarray(rng.standard_normal((n, k)))
    L = pk.cholesky(H, interpret=True)
    X = pk.cho_solve(L, B, interpret=True)
    X_ref = jnp.linalg.solve(H, B)
    np.testing.assert_allclose(np.asarray(X), np.asarray(X_ref),
                               rtol=1e-8, atol=1e-8)


def test_cho_solve_vector_rhs():
    rng = np.random.default_rng(7)
    n = 33
    H = _spd(rng, n)
    b = jnp.asarray(rng.standard_normal(n))
    L = pk.cholesky(H, interpret=True)
    x = pk.cho_solve(L, b, interpret=True)
    assert x.shape == (n,)
    np.testing.assert_allclose(np.asarray(x),
                               np.asarray(jnp.linalg.solve(H, b)),
                               rtol=1e-8, atol=1e-8)


def test_batched_vmap():
    rng = np.random.default_rng(11)
    B, n = 4, 19
    Hs = jnp.stack([_spd(rng, n) for _ in range(B)])
    rhs = jnp.asarray(rng.standard_normal((B, n, 2)))
    Ls = pk.cholesky(Hs, interpret=True)
    Xs = pk.cho_solve(Ls, rhs, interpret=True)
    for i in range(B):
        np.testing.assert_allclose(
            np.asarray(Ls[i]), np.asarray(jnp.linalg.cholesky(Hs[i])),
            rtol=1e-10, atol=1e-10)
        np.testing.assert_allclose(
            np.asarray(Xs[i]), np.asarray(jnp.linalg.solve(Hs[i], rhs[i])),
            rtol=1e-8, atol=1e-8)


def test_f32_accuracy():
    """f32 kernels (the TPU production dtype) stay within f32 roundoff of
    the f64 truth."""
    rng = np.random.default_rng(3)
    n = 50
    H64 = _spd(rng, n)
    L32 = pk.cholesky(H64.astype(jnp.float32), interpret=True)
    L64 = jnp.linalg.cholesky(H64)
    np.testing.assert_allclose(np.asarray(L32), np.asarray(L64),
                               rtol=2e-4, atol=2e-4)


def test_schur_kkt_with_pallas_toggled():
    """_SchurKKT Cholesky ladder with the Pallas kernels forced on
    (interpret mode) agrees with the stock XLA path on an f32 KKT solve."""
    from scptoolbox_tpu.ops import cones as cn
    from scptoolbox_tpu.ops import ipm as ipm_mod

    rng = np.random.default_rng(21)
    nz, nl, soc = 3, 8, 5
    m = nz + nl + soc
    n = 10
    A = jnp.asarray(rng.standard_normal((m, n)), jnp.float32)
    spec = cn.ConeSpec(nz=nz, nl=nl, socs=(soc,))
    s = jnp.asarray(np.abs(rng.standard_normal(m)) + 1.0, jnp.float32)
    z = jnp.asarray(np.abs(rng.standard_normal(m)) + 1.0, jnp.float32)
    s = s.at[nz:nz + soc].set(jnp.asarray([3.0, 0.1, -0.2, 0.3, 0.1]))
    z = z.at[nz:nz + soc].set(jnp.asarray([2.5, -0.1, 0.2, 0.1, 0.0]))
    W = cn.nt_scaling(spec, s, z)
    mask = jnp.asarray(spec.cone_mask(), jnp.float32)
    rhs = jnp.asarray(rng.standard_normal(n + m), jnp.float32)

    kkt = ipm_mod._SchurKKT(spec, A, jnp.asarray(1e-7, jnp.float32), mask)
    kkt.use_lu = False

    kkt.use_pallas = False
    sol_xla = kkt.solve(kkt.factor(W), rhs)

    kkt.use_pallas = True
    # force interpret mode (no TPU in CI)
    orig = pk._interpret_default
    pk._interpret_default = lambda: True
    try:
        sol_pl = kkt.solve(kkt.factor(W), rhs)
    finally:
        pk._interpret_default = orig
    np.testing.assert_allclose(np.asarray(sol_pl), np.asarray(sol_xla),
                               rtol=5e-3, atol=5e-3)


def test_gj_inverse_matches_numpy():
    from scptoolbox_tpu.ops.pallas_kernels import gj_inverse

    rng = np.random.default_rng(0)
    for (nb, s) in ((5, 17), (130, 40)):
        M = rng.standard_normal((nb, s, s)) + 5 * np.eye(s)
        inv = np.asarray(gj_inverse(jnp.asarray(M), interpret=True))
        err = max(np.abs(M[i] @ inv[i] - np.eye(s)).max()
                  for i in range(nb))
        assert err < 1e-10, (nb, s, err)


def test_lu_lanes_pivoted_solve():
    """Partial pivoting must survive tiny diagonals (the staged KKT's
    ~1e-7 regularization pivots — unpivoted elimination explodes there,
    measured on the f32 starship blocks)."""
    from scptoolbox_tpu.ops.pallas_kernels import (lu_factor_lanes,
                                                   lu_solve_lanes)

    rng = np.random.default_rng(0)
    nb, s = 7, 23
    M = rng.standard_normal((nb, s, s))
    M[:, np.arange(s), np.arange(s)] *= 1e-7
    fac = lu_factor_lanes(jnp.asarray(M))
    for K in (1, 5, 21):
        B = rng.standard_normal((nb, s, K))
        X = np.asarray(lu_solve_lanes(fac, jnp.asarray(B)))
        err = np.abs(np.einsum("bij,bjk->bik", M, X) - B).max()
        assert err < 1e-9, (K, err)


def test_lu_lanes_vmap_flattens():
    """vmap over a leading axis must agree with the flat call (the custom
    batch rule flattens into the lane dimension)."""
    from scptoolbox_tpu.ops.pallas_kernels import (lu_factor_lanes,
                                                   lu_solve_lanes)

    rng = np.random.default_rng(1)
    M = rng.standard_normal((3, 4, 12, 12)) + 4 * np.eye(12)
    B = rng.standard_normal((3, 4, 12, 2))
    Xf = np.asarray(lu_solve_lanes(lu_factor_lanes(jnp.asarray(M)),
                                   jnp.asarray(B)))
    Xv = np.asarray(jax.vmap(
        lambda m, b: lu_solve_lanes(lu_factor_lanes(m), b))(
            jnp.asarray(M), jnp.asarray(B)))
    np.testing.assert_allclose(Xv, Xf, rtol=1e-12, atol=1e-12)
    # closure-captured (unbatched) factors under vmap broadcast correctly
    fac1 = lu_factor_lanes(jnp.asarray(M[0, 0]))
    Xc = jax.vmap(lambda b: lu_solve_lanes(fac1, b))(jnp.asarray(B[0]))
    ref = np.linalg.solve(M[0, 0], B[0])
    np.testing.assert_allclose(np.asarray(Xc), ref, rtol=1e-9, atol=1e-10)


def test_staged_crpl_matches_staged_cr():
    """The Pallas-engine CR backend reproduces StagedCR on a real PTR
    subproblem (double integrator, interpret mode on CPU)."""
    from scptoolbox_tpu.models.double_integrator import double_integrator
    from scptoolbox_tpu.ops import cones as cn, ipm
    from scptoolbox_tpu.ops.aug_kkt import StagedCR, StagedCRPL
    from scptoolbox_tpu.solvers import ptr

    pbm = double_integrator()
    pars = ptr.PTRParameters(N=15, Nsub=8, iter_max=3,
                             kkt_method="staged_lu")
    S = ptr.PTR(pbm, pars)
    xg, ug, pg = S._guess
    dltv = S._discretize(xg, ug, pg)
    A, b, c, _ = jax.jit(lambda *a: S._assemble(*a))(
        xg, ug, pg, dltv, S.consts)
    spec = S.spec
    rng = np.random.default_rng(0)
    cone_mask = jnp.asarray(spec.cone_mask(), A.dtype)
    reg = jnp.asarray(1e-10, A.dtype)
    stt = S._kkt_builder(spec, A, reg, cone_mask).st
    cr = StagedCR(spec, A, reg, cone_mask, stt)
    pkl = StagedCRPL(spec, A, reg, cone_mask, stt)

    def rand_int():
        m = spec.m
        v = np.abs(rng.standard_normal(m)) + 0.5
        off = spec.nz + spec.nl
        for d in spec.socs:
            w = rng.standard_normal(d - 1) * 0.2
            v[off] = np.linalg.norm(w) + 1.0
            v[off + 1: off + d] = w
            off += d
        v[: spec.nz] = 0.0
        return jnp.asarray(v)

    W = cn.nt_scaling(spec, rand_int(), rand_int())
    rhs = jnp.asarray(rng.standard_normal(A.shape[0] + A.shape[1]))
    s1 = cr.solve(cr.factor(W), rhs)
    s2 = pkl.solve(pkl.factor(W), rhs)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(s1),
                               rtol=1e-6, atol=1e-7)
