"""Exponential-cone unit tests: interior/violation predicates, max-step
bisection, and IPM solves against closed-form/scipy oracles (the last
missing cone from the reference's SupportedCone set, cone.jl:48; consumed
by GuSTO's softplus penalty, gusto.jl:996-1031)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from scptoolbox_tpu.ops import cones as cn
from scptoolbox_tpu.ops import ipm
from scptoolbox_tpu.ops.cones import ConeSpec


def test_exp_interior_predicates():
    inside = jnp.asarray([[0.0, 1.0, 2.0],       # 1*e^0=1 <= 2
                          [-1.0, 2.0, 1.3],      # 2 e^{-1/2}=1.213 < 1.3
                          list(cn.EXP_PRIMAL_CENTRAL)])
    outside = jnp.asarray([[0.0, 1.0, 0.9],      # e^0 > 0.9
                           [0.0, -1.0, 1.0],     # y < 0
                           [5.0, 1.0, 2.0]])
    assert bool(jnp.all(cn.exp_interior(inside, dual=False)))
    assert not bool(jnp.any(cn.exp_interior(outside, dual=False)))

    d_in = jnp.asarray([[-1.0, 0.0, 1.0],        # 1*e^{0} = 1 <= e*1
                        list(cn.EXP_DUAL_CENTRAL)])
    d_out = jnp.asarray([[1.0, 0.0, 1.0],        # u > 0
                         [-1.0, 5.0, 0.001]])    # w < -u e^{v/u-1} = e^-6
    assert bool(jnp.all(cn.exp_interior(d_in, dual=True)))
    assert not bool(jnp.any(cn.exp_interior(d_out, dual=True)))


def test_exp_violation_measure():
    spec = ConeSpec(nl=1, nexp=1)
    ok = jnp.asarray([0.5, -1.0, 2.0, 1.3])     # exp: 2 log(0.65)+1 > 0
    assert float(cn.violation(spec, ok)) == 0.0
    lin_bad = jnp.asarray([-1.0, -1.0, 2.0, 1.3])
    assert float(cn.violation(spec, lin_bad)) == pytest.approx(1.0)
    ok2 = jnp.asarray([0.5, 0.0, 1.0, 1.001])
    assert float(cn.violation(spec, ok2)) == 0.0
    bad = jnp.asarray([0.5, 1.0, 1.0, 0.5])     # e^1 > 0.5
    assert float(cn.violation(spec, bad)) > 0.4


def test_exp_violation_boundary_continuity():
    """(x<=0, y>0, z=0) is NOT in cl(K_exp) (y>0 forces y e^{x/y} > 0 >= z)
    and the measure is continuous as z -> 0+ (ADVICE r3: the old face
    branch reported 0 there while (-1, 1, 1e-12) scored 26.6)."""
    at_zero = cn.exp_violation(jnp.asarray([[-1.0, 1.0, 0.0]]))
    assert float(at_zero[0]) > 0.0
    near_zero = cn.exp_violation(jnp.asarray([[-1.0, 1.0, 1e-12]]))
    # no discontinuity: both strictly positive, same order of magnitude cap
    assert float(near_zero[0]) > 0.0
    # the true boundary face {y = 0, x <= 0, z >= 0} IS in the closure
    face = cn.exp_violation(jnp.asarray([[-1.0, 0.0, 0.5],
                                         [-2.0, 0.0, 0.0]]))
    assert float(jnp.max(face)) == 0.0


def test_exp_max_step_bisection():
    """alpha* for a ray crossing the exp boundary matches a fine scan."""
    spec = ConeSpec(nexp=1)
    s = jnp.asarray(cn.EXP_PRIMAL_CENTRAL)
    ds = jnp.asarray([1.0, -0.3, -0.5])
    alpha = float(cn.max_step(spec, s, ds, dual=False))
    assert 0.0 < alpha < 1e11
    assert bool(jnp.all(cn.exp_interior((s + 0.999 * alpha * ds)[None, :],
                                        dual=False)))
    assert not bool(jnp.all(cn.exp_interior((s + 1.01 * alpha * ds)[None, :],
                                            dual=False)))
    # interior-pointing ray hits the cap
    alpha2 = float(cn.max_step(spec, s, jnp.asarray([0.0, 1.0, 2.0]),
                               dual=False))
    assert alpha2 >= 1e11


def test_exp_dual_barrier_autodiff():
    """grad/hess of the dual barrier are consistent and the central point
    satisfies grad F*(e*) = -e* (3-log-homogeneous barrier)."""
    z = jnp.asarray(cn.EXP_DUAL_CENTRAL)
    g, H = cn.exp_dual_grad_hess(z[None, :])
    assert np.allclose(np.asarray(g[0]), -np.asarray(z), atol=1e-9)
    # Hessian SPD at the central point
    w = np.linalg.eigvalsh(np.asarray(H[0]))
    assert np.all(w > 0)
    # log-homogeneity: grad F*(t z) = grad F*(z)/t
    g2, _ = cn.exp_dual_grad_hess(3.0 * z[None, :])
    assert np.allclose(np.asarray(g2[0]), np.asarray(g[0]) / 3.0, atol=1e-9)


def test_ipm_exp_epigraph():
    """min t s.t. (a, 1, t) in K_exp  =>  t* = e^a."""
    for a in (-1.0, 0.0, 0.7, 2.0):
        spec = ConeSpec(nexp=1)
        A = jnp.asarray([[0.0], [0.0], [-1.0]])
        b = jnp.asarray([a, 1.0, 0.0])
        c = jnp.asarray([1.0])
        sol = ipm.solve(A, b, c, spec, tol=1e-8, max_iter=60)
        assert int(sol.status) in (int(ipm.IPMStatus.OPTIMAL),
                                   int(ipm.IPMStatus.ALMOST_OPTIMAL))
        assert float(sol.x[0]) == pytest.approx(np.exp(a), rel=1e-6)


def test_ipm_exp_softplus_lse():
    """min w s.t. e^{-w} <= u, e^{hf-w} <= v, u+v <= 1 (the reference's
    softplus lowering, gusto.jl:996-1031)  =>  w* = log(1 + e^{hf})."""
    for hf in (-2.0, 0.0, 1.5, 4.0):
        spec = ConeSpec(nl=1, nexp=2)
        A = np.zeros((7, 3))
        b = np.zeros(7)
        A[0, 1] = 1.0
        A[0, 2] = 1.0
        b[0] = 1.0              # 1 - u - v >= 0
        A[1, 0] = 1.0           # exp1: (-w, 1, u)
        b[2] = 1.0
        A[3, 1] = -1.0
        A[4, 0] = 1.0           # exp2: (hf - w, 1, v)
        b[4] = hf
        b[5] = 1.0
        A[6, 2] = -1.0
        c = np.asarray([1.0, 0.0, 0.0])
        sol = ipm.solve(jnp.asarray(A), jnp.asarray(b), jnp.asarray(c),
                        spec, tol=1e-8, max_iter=80)
        assert int(sol.status) in (int(ipm.IPMStatus.OPTIMAL),
                                   int(ipm.IPMStatus.ALMOST_OPTIMAL))
        assert float(sol.x[0]) == pytest.approx(np.log1p(np.exp(hf)),
                                                rel=1e-5, abs=1e-6)


def test_ipm_exp_entropy_scipy_oracle():
    """Entropy maximization: max sum_i H(p_i) over the simplex with a
    linear moment constraint — solved via exp cones, checked against a
    scipy.optimize oracle."""
    from scipy.optimize import minimize

    rng = np.random.default_rng(7)
    nvar = 4
    a_vec = rng.standard_normal(nvar)
    mtar = 0.1

    # vars: p (nvar), t (nvar); max sum t  <=>  min -sum t
    # t_i <= -p_i log p_i  <=>  (t_i, p_i, 1) in K_exp
    #   (p_i e^{t_i/p_i} <= 1 <=> t_i <= -p_i log p_i)
    nv = 2 * nvar
    rows = 2 + 2 * 1 + 3 * nvar  # 2 zero (sum p = 1, a'p = m), nonneg p?
    A = np.zeros((2 + nvar + 3 * nvar, nv))
    b = np.zeros(2 + nvar + 3 * nvar)
    # zero rows: sum p - 1 = 0; a'p - mtar = 0
    A[0, :nvar] = 1.0
    b[0] = 1.0
    A[1, :nvar] = a_vec
    b[1] = mtar
    # nonneg: p >= 0
    for i in range(nvar):
        A[2 + i, i] = -1.0
    # exp blocks (t_i, p_i, 1)
    off = 2 + nvar
    for i in range(nvar):
        A[off + 3 * i, nvar + i] = -1.0
        A[off + 3 * i + 1, i] = -1.0
        b[off + 3 * i + 2] = 1.0
    c = np.concatenate([np.zeros(nvar), -np.ones(nvar)])
    spec = ConeSpec(nz=2, nl=nvar, nexp=nvar)
    sol = ipm.solve(jnp.asarray(A), jnp.asarray(b), jnp.asarray(c), spec,
                    tol=1e-8, max_iter=80)
    assert int(sol.status) in (int(ipm.IPMStatus.OPTIMAL),
                               int(ipm.IPMStatus.ALMOST_OPTIMAL))
    p_ipm = np.asarray(sol.x[:nvar])

    def negent(p):
        return np.sum(p * np.log(np.maximum(p, 1e-300)))

    res = minimize(
        negent, np.full(nvar, 1.0 / nvar), method="SLSQP",
        bounds=[(1e-12, 1.0)] * nvar,
        constraints=[{"type": "eq", "fun": lambda p: np.sum(p) - 1.0},
                     {"type": "eq", "fun": lambda p: a_vec @ p - mtar}],
        options={"ftol": 1e-12, "maxiter": 200})
    assert res.success
    assert np.allclose(p_ipm, res.x, atol=1e-4)
    assert -float(jnp.sum(sol.x[nvar:])) == pytest.approx(res.fun, abs=1e-5)


def test_ipm_exp_mixed_soc():
    """Exp + SOC in one problem: min ||y||_2 + e^{x} epigraph coupling."""
    # vars: x, t (e^x <= t), r (||(x - 1, 2)||_2 <= r); min t + r
    # rows: soc (r, x - 1, 2) first, then exp (x, 1, t) (ConeSpec layout)
    A = np.zeros((6, 3))
    b = np.zeros(6)
    A[0, 2] = -1.0              # soc: (r, x-1, 2)
    A[1, 0] = -1.0
    b[1] = -1.0
    b[2] = 2.0
    A[3, 0] = -1.0              # exp: (x, 1, t)
    b[4] = 1.0
    A[5, 1] = -1.0
    c = np.asarray([0.0, 1.0, 1.0])
    spec = ConeSpec(socs=(3,), nexp=1)
    sol = ipm.solve(jnp.asarray(A), jnp.asarray(b), jnp.asarray(c), spec,
                    tol=1e-8, max_iter=80)
    assert int(sol.status) in (int(ipm.IPMStatus.OPTIMAL),
                               int(ipm.IPMStatus.ALMOST_OPTIMAL))

    # oracle: minimize e^x + sqrt((x-1)^2 + 4) in 1d
    from scipy.optimize import minimize_scalar

    res = minimize_scalar(lambda x: np.exp(x) + np.hypot(x - 1.0, 2.0),
                          bounds=(-5.0, 5.0), method="bounded",
                          options={"xatol": 1e-12})
    obj = float(sol.x[1] + sol.x[2])
    assert obj == pytest.approx(res.fun, rel=1e-6)
    assert float(sol.x[0]) == pytest.approx(res.x, abs=1e-4)


def test_modeling_layer_exp_cone():
    """EXP posted through the modeling layer (reference @add_constraint
    EXP, cone.jl:48/:103-171): entropy-regularized linear cost over the
    simplex. min c'x + sum_i x_i log x_i  ->  x* = softmax(-c), optimal
    value -log(sum e^{-c_i})."""
    from scptoolbox_tpu.parser.problem import exp_cone, zero
    from scptoolbox_tpu.parser.program import ConicProgram

    n = 4
    c_vec = np.asarray([0.3, -0.2, 0.8, 0.0])
    prg = ConicProgram()
    x = prg.variable("x", n)
    t = prg.variable("t", n)

    def simplex(xv):
        return [zero(jnp.sum(xv) - 1.0)]

    def entropy(xv, tv):
        # t_i >= x_i log x_i  <=>  (-t_i, x_i, 1) in K_exp
        return [exp_cone(jnp.stack([-tv[i], xv[i], 1.0]))
                for i in range(n)]

    prg.add_constraint("simplex", simplex, (x,))
    prg.add_constraint("entropy", entropy, (x, t))
    prg.add_cost(lambda xv, tv: jnp.dot(jnp.asarray(c_vec), xv)
                 + jnp.sum(tv), (x, t))
    prg.build()
    sol = prg.solve(tol=1e-9, max_iter=80)
    assert int(sol.status) in (int(ipm.IPMStatus.OPTIMAL),
                               int(ipm.IPMStatus.ALMOST_OPTIMAL))
    x_star = np.exp(-c_vec) / np.sum(np.exp(-c_vec))
    np.testing.assert_allclose(np.asarray(sol.values["x"]), x_star,
                               atol=2e-4)
    assert float(sol.obj) == pytest.approx(
        -np.log(np.sum(np.exp(-c_vec))), abs=1e-5)


def test_staged_kkt_with_exp_blocks():
    """The stage-structured KKT (QR and CR sweeps) classifies 3-row exp
    units and matches the dense path on a GuSTO softplus template (the
    VERDICT r4 gap: AugStageStructure asserted nexp == 0, so softplus
    GuSTO could never run structured)."""
    from scptoolbox_tpu.models.quadrotor import quadrotor
    from scptoolbox_tpu.solvers import gusto

    pbm = quadrotor()
    base = dict(N=12, Nsub=6, iter_max=3, pen="softplus", hom=500.0,
                lam_init=1e3)
    Sq = gusto.GuSTO(pbm, gusto.GuSTOParameters(**base,
                                                kkt_method="staged_qr"))
    assert Sq.spec.nexp > 0
    assert Sq._kkt_builder is not None, "exp-bearing aug probe failed"

    xg, ug, pg = Sq._guess
    dltv = Sq._discretize(xg, ug, pg)
    eta = jnp.asarray(1.0, Sq.dtype)
    lam = jnp.asarray(1e3, Sq.dtype)
    A, b, c, _ = jax.jit(lambda *a: Sq._assemble(*a))(
        xg, ug, pg, dltv, eta, lam, Sq.consts)
    ok = (int(ipm.IPMStatus.OPTIMAL), int(ipm.IPMStatus.ALMOST_OPTIMAL))
    sol_dense = ipm.solve(A, b, c, Sq.spec, tol=1e-8, max_iter=80)
    assert int(sol_dense.status) in ok
    for method in ("staged_qr", "staged_cr"):
        Sm = gusto.GuSTO(pbm, gusto.GuSTOParameters(**base,
                                                    kkt_method=method))
        sol_st = ipm.solve(A, b, c, Sm.spec, tol=1e-8, max_iter=80,
                           kkt_builder=Sm._kkt_builder)
        assert int(sol_st.status) in ok, method
        assert float(sol_st.obj) == pytest.approx(float(sol_dense.obj),
                                                  abs=1e-5), method


def test_gusto_softplus_staged_end_to_end():
    """Full GuSTO softplus solve with the staged CR KKT matches the dense
    default (exp blocks through the whole SCP stack)."""
    from scptoolbox_tpu.config import SCPStatus
    from scptoolbox_tpu.models.quadrotor import quadrotor
    from scptoolbox_tpu.solvers import gusto

    pbm = quadrotor()
    base = dict(N=12, Nsub=6, iter_max=10, pen="softplus", hom=500.0,
                lam_init=1e3)
    sol_ref = gusto.solve(quadrotor(), gusto.GuSTOParameters(**base))
    sol_stg = gusto.solve(pbm, gusto.GuSTOParameters(
        **base, kkt_method="staged_cr"))
    assert sol_ref.status == SCPStatus.SOLVED
    assert sol_stg.status == SCPStatus.SOLVED
    assert sol_stg.cost == pytest.approx(sol_ref.cost, rel=1e-4)
