"""KKT variational sensitivity tests (reference src/parser/variation.jl,
exercised in reference test/core/variation.jl-style usage): directional
solution sensitivities of solved conic programs against closed forms."""

import jax.numpy as jnp
import numpy as np
import pytest

from scptoolbox_tpu.parser.problem import nonpos, soc, zero
from scptoolbox_tpu.parser.program import ConicProgram
from scptoolbox_tpu.parser.variation import variation


def test_active_bound_sensitivity():
    """min (x - 2)^2 s.t. x >= theta. At theta = 3 the bound is active:
    x*(theta) = theta, dx/dtheta = 1."""
    prg = ConicProgram()
    x = prg.variable("x", 1)
    th = prg.parameter("theta", 3.0)
    prg.add_constraint("bound", lambda xv, t: [nonpos(t - xv)], (x, th))
    prg.add_cost(lambda xv: jnp.sum((xv - 2.0) ** 2), (x,))
    prg.build()
    sol = prg.solve()
    assert float(sol.values["x"][0]) == pytest.approx(3.0, abs=1e-6)

    var = variation(prg, sol, {"theta": 3.0})
    d = var.solve({"theta": 1.0})
    assert float(d.dvalues["x"][0]) == pytest.approx(1.0, abs=1e-4)


def test_inactive_bound_sensitivity():
    """Same problem at theta = 1 (bound inactive): x* = 2, dx/dtheta = 0."""
    prg = ConicProgram()
    x = prg.variable("x", 1)
    th = prg.parameter("theta", 1.0)
    prg.add_constraint("bound", lambda xv, t: [nonpos(t - xv)], (x, th))
    prg.add_cost(lambda xv: jnp.sum((xv - 2.0) ** 2), (x,))
    prg.build()
    sol = prg.solve()
    assert float(sol.values["x"][0]) == pytest.approx(2.0, abs=1e-5)

    var = variation(prg, sol, {"theta": 1.0})
    d = var.solve({"theta": 1.0})
    assert abs(float(d.dvalues["x"][0])) < 1e-4


def test_soc_radius_sensitivity():
    """min c'x s.t. ||x|| <= theta: x* = -theta c/||c||,
    dx/dtheta = -c/||c||."""
    c_vec = np.asarray([3.0, -4.0])
    prg = ConicProgram()
    x = prg.variable("x", 2)
    th = prg.parameter("theta", 2.0)
    prg.add_constraint(
        "ball", lambda xv, t: [soc(jnp.concatenate([t.reshape(1), xv]))],
        (x, th))
    prg.add_cost(lambda xv: jnp.dot(jnp.asarray(c_vec), xv), (x,))
    prg.build()
    sol = prg.solve()
    expect = -2.0 * c_vec / np.linalg.norm(c_vec)
    assert np.allclose(np.asarray(sol.values["x"]), expect, atol=1e-6)

    var = variation(prg, sol, {"theta": 2.0})
    d = var.solve({"theta": 1.0})
    assert np.allclose(np.asarray(d.dvalues["x"]),
                       -c_vec / np.linalg.norm(c_vec), atol=1e-3)


def test_equality_rhs_sensitivity():
    """min ||x||^2 s.t. a'x = theta: x* = theta a/||a||^2,
    dx/dtheta = a/||a||^2."""
    a = np.asarray([1.0, 2.0, -1.0])
    prg = ConicProgram()
    x = prg.variable("x", 3)
    th = prg.parameter("theta", 4.0)
    prg.add_constraint(
        "plane", lambda xv, t: [zero((jnp.dot(jnp.asarray(a), xv)
                                      - t).reshape(1))], (x, th))
    prg.add_cost(lambda xv: jnp.dot(xv, xv), (x,))
    prg.build()
    sol = prg.solve()
    expect = 4.0 * a / np.dot(a, a)
    assert np.allclose(np.asarray(sol.values["x"]), expect, atol=1e-6)

    var = variation(prg, sol, {"theta": 4.0})
    d = var.solve({"theta": 1.0})
    assert np.allclose(np.asarray(d.dvalues["x"]), a / np.dot(a, a),
                       atol=1e-4)


def test_perturbation_spec_fixed_and_bounded():
    """Per-element Perturbation spec (reference perturbation.jl:22-111,
    consumed at variation.jl:186-226): FIXED pins a delta element to zero,
    ABSOLUTE clips |delta| at the amount, FREE leaves the tangent."""
    from scptoolbox_tpu.parser.perturbation import (ABSOLUTE, FIXED, FREE,
                                                    Perturbation)

    def build():
        prg = ConicProgram()
        x = prg.variable("x", 2)
        th = prg.parameter("theta", 3.0)
        # both coordinates ride the active bound: x >= theta elementwise
        prg.add_constraint("bound", lambda xv, t: [nonpos(t - xv)], (x, th))
        prg.add_cost(lambda xv: jnp.sum((xv - 2.0) ** 2), (x,))
        prg.build()
        return prg, prg.solve()

    prg, sol = build()
    assert np.allclose(np.asarray(sol.values["x"]), 3.0, atol=1e-6)

    # unconstrained tangent: dx/dtheta = (1, 1)
    var = variation(prg, sol, {"theta": 3.0})
    d = var.solve({"theta": 1.0})
    assert np.allclose(np.asarray(d.dvalues["x"]), 1.0, atol=1e-4)

    # FIXED on element 0 pins its delta; element 1 keeps the tangent
    prg, sol = build()
    var = variation(prg, sol, {"theta": 3.0}, relax=True,
                    perturbations={"x": Perturbation.make((2,),
                                                          [FIXED, FREE])})
    d = var.solve({"theta": 1.0})
    assert abs(float(d.dvalues["x"][0])) < 1e-4
    assert float(d.dvalues["x"][1]) == pytest.approx(1.0, abs=1e-3)

    # ABSOLUTE amount 0.25 clips the physical delta magnitude
    prg, sol = build()
    var = variation(prg, sol, {"theta": 3.0}, relax=True,
                    perturbations={"x": Perturbation.make(
                        (2,), ABSOLUTE, 0.25)})
    d = var.solve({"theta": 1.0})
    assert np.all(np.abs(np.asarray(d.dvalues["x"])) < 0.25 + 1e-4)


def test_perturbation_spec_requires_amount():
    from scptoolbox_tpu.parser.perturbation import ABSOLUTE, Perturbation

    with pytest.raises(ValueError):
        Perturbation.make((3,), ABSOLUTE)  # amount mandatory


def test_perturbation_spec_multidim_kind_list():
    """Per-element kind sequences broadcast onto multi-dim block shapes
    (reference perturbation.jl:50-89; ADVICE r3 medium: 6 kinds onto (2,3)
    used to raise in np.broadcast_to)."""
    from scptoolbox_tpu.parser.perturbation import (ABSOLUTE, FIXED, FREE,
                                                    Perturbation)

    p = Perturbation.make((2, 3), [FIXED, FREE, ABSOLUTE] * 2,
                          amount=1.5)
    assert p.kind.shape == (2, 3) and p.amount.shape == (2, 3)
    assert p.kind[0, 0] is FIXED and p.kind[0, 1] is FREE
    assert p.kind[1, 2] is ABSOLUTE
    assert p.amount[0, 1] == np.inf          # FREE forces inf
    assert p.amount[1, 2] == 1.5
    # single kind still broadcasts over the whole block
    q = Perturbation.make((2, 2), FIXED)
    assert all(k is FIXED for k in q.kind.reshape(-1))
    assert np.all(q.amount == 0.0)
