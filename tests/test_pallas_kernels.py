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
