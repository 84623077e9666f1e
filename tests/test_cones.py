"""Unit tests for the symmetric-cone toolkit (ops/cones.py).

The reference has no unit tests for its cone layer (it delegates to JuMP/MOI,
src/parser/cone.jl); since we implement the cone algebra ourselves these
verify the Jordan-algebra identities and NT-scaling properties directly.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from scptoolbox_tpu.ops import cones as C


SPECS = [
    C.ConeSpec(nz=0, nl=5, socs=()),
    C.ConeSpec(nz=3, nl=4, socs=(3, 3, 5)),
    C.ConeSpec(nz=0, nl=0, socs=(2, 7)),
    C.ConeSpec(nz=2, nl=0, socs=(4,)),
]


def interior_point(spec, rng, scale=1.0):
    """Random strictly interior point of K (zero rows = 0)."""
    v = rng.standard_normal(spec.m) * scale
    v[: spec.nz] = 0.0
    v[spec.lin_slice] = np.abs(v[spec.lin_slice]) + 0.5
    off = spec.nz + spec.nl
    for d in spec.socs:
        tail = v[off + 1 : off + d]
        v[off] = np.linalg.norm(tail) + 0.5 + abs(v[off])
        off += d
    return jnp.asarray(v)


@pytest.mark.parametrize("spec", SPECS)
def test_identity_element(spec):
    rng = np.random.default_rng(0)
    v = interior_point(spec, rng)
    e = C.identity_elem(spec, dtype=v.dtype)
    got = C.cone_product(spec, e, v)
    # e o v = v on cone rows (zero rows are 0 in both)
    np.testing.assert_allclose(np.asarray(got), np.asarray(v), atol=1e-12)


@pytest.mark.parametrize("spec", SPECS)
def test_cone_div_inverts_product(spec):
    rng = np.random.default_rng(1)
    lam = interior_point(spec, rng)
    x = interior_point(spec, rng, scale=2.0)
    v = C.cone_product(spec, lam, x)
    x_rec = C.cone_div(spec, lam, v)
    mask = spec.cone_mask()
    np.testing.assert_allclose(
        np.asarray(x_rec) * mask, np.asarray(x) * mask, rtol=1e-9, atol=1e-9
    )


@pytest.mark.parametrize("spec", SPECS)
def test_nt_scaling_maps_s_z_to_common_lambda(spec):
    """Defining property of NT scaling: W z = W^{-1} s = lambda."""
    rng = np.random.default_rng(2)
    s = interior_point(spec, rng)
    z = interior_point(spec, rng, scale=1.7)
    W = C.nt_scaling(spec, s, z)
    lam_z = C.scale(spec, W, z)
    lam_s = C.scale(spec, W, s, inverse=True)
    mask = spec.cone_mask()
    np.testing.assert_allclose(
        np.asarray(lam_z) * mask, np.asarray(lam_s) * mask, rtol=1e-8, atol=1e-8
    )
    # lambda o lambda has the same trace inner product as s'z
    lam = lam_z * mask
    np.testing.assert_allclose(
        float(jnp.sum(lam * lam)),
        float(jnp.sum((s * mask) * (z * mask))),
        rtol=1e-8,
    )


@pytest.mark.parametrize("spec", SPECS)
def test_w2_dense_matches_double_apply(spec):
    rng = np.random.default_rng(3)
    s = interior_point(spec, rng)
    z = interior_point(spec, rng)
    W = C.nt_scaling(spec, s, z)
    W2 = C.w2_dense(spec, W)
    v = jnp.asarray(rng.standard_normal(spec.m))
    via_dense = W2 @ v
    via_apply = C.scale(spec, W, C.scale(spec, W, v))
    mask = spec.cone_mask()
    np.testing.assert_allclose(
        np.asarray(via_dense) * mask, np.asarray(via_apply) * mask,
        rtol=1e-8, atol=1e-8,
    )


@pytest.mark.parametrize("spec", SPECS)
def test_scale_inverse_roundtrip(spec):
    rng = np.random.default_rng(4)
    s = interior_point(spec, rng)
    z = interior_point(spec, rng)
    W = C.nt_scaling(spec, s, z)
    v = jnp.asarray(rng.standard_normal(spec.m))
    rt = C.scale(spec, W, C.scale(spec, W, v), inverse=True)
    mask = spec.cone_mask()
    np.testing.assert_allclose(
        np.asarray(rt) * mask, np.asarray(v) * mask, rtol=1e-9, atol=1e-9
    )


@pytest.mark.parametrize("spec", SPECS)
@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_max_step_brute_force(spec, seed):
    rng = np.random.default_rng(10 + seed)
    u = interior_point(spec, rng)
    du = jnp.asarray(rng.standard_normal(spec.m))
    alpha = float(C.max_step(spec, u, du))
    mask = spec.cone_mask()

    def in_cone(a):
        v = np.asarray(u + a * du) * mask
        off = spec.nz
        ok = np.all(v[off : off + spec.nl] >= -1e-9)
        off += spec.nl
        for d in spec.socs:
            ok &= v[off] >= np.linalg.norm(v[off + 1 : off + d]) - 1e-9
            off += d
        return ok

    if alpha < 1e11:
        assert in_cone(0.999 * alpha), "just inside the reported step"
        assert not in_cone(1.01 * alpha + 1e-9), "just outside the reported step"
    else:
        # reported unbounded: spot-check far along the ray
        assert in_cone(1e6)


@pytest.mark.parametrize("spec", SPECS)
def test_project_properties(spec):
    rng = np.random.default_rng(5)
    v = jnp.asarray(rng.standard_normal(spec.m) * 3.0)
    p = C.project(spec, v)
    p2 = C.project(spec, p)
    np.testing.assert_allclose(np.asarray(p2), np.asarray(p), atol=1e-9)
    # projection of an interior point is itself
    u = interior_point(spec, rng)
    np.testing.assert_allclose(
        np.asarray(C.project(spec, u)), np.asarray(u), atol=1e-12
    )
    # violation is 0 exactly on K
    assert float(C.violation(spec, u)) < 1e-12
    # Moreau: v = proj_K(v) - proj_K*(-v), check <p, v-p> ~= 0 per SOC/lin part
    resid = v - p
    assert float(jnp.abs(jnp.sum(p * resid))) < 1e-8


def test_geom_ndim_lowering():
    """General n-dim GeometricMeanCone lowering (reference cone.jl:103-171
    supports any n via MOI; here a balanced sqrt tree of SOCs):
    max t s.t. t <= geomean(x) at fixed x equals the geometric mean."""
    import numpy as np
    from scptoolbox_tpu.parser.problem import geom, zero
    from scptoolbox_tpu.parser.program import ConicProgram

    for n in (2, 3, 4, 5, 7):
        rng = np.random.default_rng(n)
        xval = 0.5 + rng.random(n)
        prg = ConicProgram()
        t = prg.variable("t")
        x = prg.variable("x", n)
        prg.add_constraint("fix", lambda xv, xval=jnp.asarray(xval):
                           [zero(xv - xval)], (x,))
        prg.add_constraint("gm", lambda tv, xv: [geom(jnp.concatenate(
            [tv.reshape(1), xv]))], (t, x))
        prg.add_cost(lambda tv: -jnp.sum(tv), (t,))
        prg.build()
        sol = prg.solve()
        gm = float(np.exp(np.mean(np.log(xval))))
        assert float(sol.values["t"]) == pytest.approx(gm, rel=1e-6), n


def test_geom_ndim_am_gm():
    """min sum(x) s.t. geomean(x) >= 1 has optimum x = 1 (AM-GM)."""
    import numpy as np
    from scptoolbox_tpu.parser.problem import geom, nonpos
    from scptoolbox_tpu.parser.program import ConicProgram

    n = 5
    prg = ConicProgram()
    x = prg.variable("x", n)
    prg.add_constraint("gm", lambda xv: [geom(jnp.concatenate(
        [jnp.ones(1), xv]))], (x,))
    prg.add_cost(lambda xv: jnp.sum(xv), (x,))
    prg.build()
    sol = prg.solve()
    assert np.allclose(np.asarray(sol.values["x"]), 1.0, atol=1e-5)
    assert float(sol.obj) == pytest.approx(float(n), rel=1e-6)
