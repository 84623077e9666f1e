"""Program introspection + user table columns (reference regex accessors
program.jl:334-403, show methods printing.jl:33-99, and
problem_add_table_column! problem.jl:649-659)."""

import jax.numpy as jnp

from scptoolbox_tpu.models.double_integrator import (
    DoubleIntegratorParameters, double_integrator)
from scptoolbox_tpu.parser.problem import nonpos, soc
from scptoolbox_tpu.parser.program import ConicProgram
from scptoolbox_tpu.solvers import ptr


def _build():
    prg = ConicProgram()
    x = prg.variable("x", 3)
    t = prg.variable("t")
    th = prg.parameter("theta", 1.0)
    prg.add_constraint(
        "ball", lambda tv, xv: [soc(jnp.concatenate([tv.reshape(1), xv]))],
        (t, x))
    prg.add_constraint("bound", lambda xv, tt: [nonpos(tt - xv)], (x, th))
    prg.add_cost(lambda tv: jnp.sum(tv), (t,))
    prg.build()
    return prg


def test_regex_accessors():
    prg = _build()
    assert prg.constraints("bo") == [("bound", ("NONPOS",), (3,))]
    assert prg.constraints("^ball$") == [("ball", ("SOC",), (4,))]
    assert len(prg.constraints()) == 2
    assert prg.variables("^x$") == [("x", (3,))]
    assert prg.parameters("theta") == [("theta", ())]


def test_describe_summary():
    prg = _build()
    text = prg.describe()
    assert "ConicProgram (built): 4 variables, 7 rows" in text
    assert "ball: SOC(4)" in text
    assert "bound: NONPOS(3)" in text
    assert repr(prg) == text


def test_user_table_column(capsys):
    """problem_add_table_column! semantics: a user column fed from the
    iteration record shows in the verbose table after the callback runs."""
    pbm = double_integrator(DoubleIntegratorParameters(drag=True, g=0.01,
                                                       s=30.0))
    seen = {}

    def callback(rec):
        seen["iter"] = rec.iteration
        return False

    pbm.callback = callback
    pbm.add_table_column("tag", "tag", "{:>6s}",
                         lambda rec: f"cb{seen['iter']}")
    pars = ptr.PTRParameters(N=15, Nsub=5, iter_max=3, wvc=1e3, wtr=5e-3)
    ptr.solve(pbm, pars, verbose=True)
    out = capsys.readouterr().out
    assert "tag" in out
    assert "cb1" in out  # value computed AFTER the callback filled `seen`
