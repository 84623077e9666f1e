"""Stage-structured KKT tests: the block-tridiagonal + arrow factorization
(ops/block_kkt.py) must reproduce the dense Schur KKT's solves on real SCP
subproblem templates, and the full IPM must return identical solutions with
either factorization. This is the structure-exploiting centerpiece of the
north star (SURVEY §5 time-axis row; VERDICT r1 missing #1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scptoolbox_tpu.models.double_integrator import double_integrator
from scptoolbox_tpu.ops import cones as cn
from scptoolbox_tpu.ops import ipm
from scptoolbox_tpu.solvers import ptr


@pytest.fixture(scope="module")
def subproblem():
    """A real PTR subproblem (double integrator, N=15) assembled at the
    guess."""
    pbm = double_integrator()
    pars = ptr.PTRParameters(N=15, Nsub=8, iter_max=3, structured_kkt=True)
    S = ptr.PTR(pbm, pars)
    assert S._kkt_builder is not None, "structure probe failed"
    xg, ug, pg = S._guess
    dltv = S._discretize(xg, ug, pg)
    A, b, c, _ = jax.jit(lambda *a: S._assemble(*a))(
        xg, ug, pg, dltv, S.consts)
    return S, A, b, c


def _random_interior(spec, rng):
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


def test_structured_matches_dense_solve(subproblem):
    S, A, b, c = subproblem
    spec = S.spec
    rng = np.random.default_rng(0)
    cone_mask = jnp.asarray(spec.cone_mask(), A.dtype)
    reg = jnp.asarray(1e-10, A.dtype)

    dense = ipm._SchurKKT(spec, A, reg, cone_mask)
    structured = S._kkt_builder(spec, A, reg, cone_mask)

    s = _random_interior(spec, rng)
    z = _random_interior(spec, rng)
    W = cn.nt_scaling(spec, s, z)
    rhs = jnp.asarray(rng.standard_normal(A.shape[0] + A.shape[1]))

    sol_d = dense.solve(dense.factor(W), rhs)
    sol_s = structured.solve(structured.factor(W), rhs)
    np.testing.assert_allclose(np.asarray(sol_s), np.asarray(sol_d),
                               rtol=1e-7, atol=1e-7)

    # W = None (initialization solve) and multi-RHS
    rhs2 = jnp.asarray(rng.standard_normal((A.shape[0] + A.shape[1], 2)))
    sol_d2 = dense.solve(dense.factor(None), rhs2)
    sol_s2 = structured.solve(structured.factor(None), rhs2)
    np.testing.assert_allclose(np.asarray(sol_s2), np.asarray(sol_d2),
                               rtol=1e-7, atol=1e-7)


def test_ipm_structured_matches_dense(subproblem):
    S, A, b, c = subproblem
    sol_dense = ipm.solve(A, b, c, S.spec, tol=1e-9, max_iter=60)
    sol_struct = ipm.solve(A, b, c, S.spec, tol=1e-9, max_iter=60,
                           kkt_builder=S._kkt_builder)
    assert int(sol_dense.status) == int(ipm.IPMStatus.OPTIMAL)
    assert int(sol_struct.status) == int(ipm.IPMStatus.OPTIMAL)
    assert float(sol_struct.obj) == pytest.approx(float(sol_dense.obj),
                                                  abs=1e-7)
    np.testing.assert_allclose(np.asarray(sol_struct.x),
                               np.asarray(sol_dense.x),
                               rtol=1e-5, atol=1e-6)


def test_structure_shape(subproblem):
    """Stage classification sanity: N stages, per-stage columns cover
    x/u/vd/wvd/eta blocks, global block holds BC relaxations."""
    S, A, b, c = subproblem
    st = S._kkt_builder(S.spec, A, jnp.asarray(1e-10, A.dtype),
                        jnp.asarray(S.spec.cone_mask(), A.dtype)).st
    N = S.pars.N
    assert st.N == N
    n_stage_cols = int((np.asarray(st.scols) < st.n).sum())
    assert n_stage_cols + st.ng == st.n
    # every cone row lands in a stage or the global bucket
    n_rows = int((np.asarray(st.rows_pad) < st.m_C).sum())
    assert n_rows + len(st.global_rows) == st.m_C
