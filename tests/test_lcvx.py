"""LCvx double-integrator tests (reference runtests.jl:31-35 +
double_integrator/tests.jl:20-55): the LCvx conic solution must match the
analytic Pontryagin-maximum-principle shooting solution for both parameter
choices, and the relaxation must be lossless (|u| = sigma)."""

import numpy as np
import pytest

from tests.costcheck import check_cost

from scptoolbox_tpu.models.double_integrator_lcvx import (
    LCvxDoubleIntegratorParameters, solve_lcvx, solve_mp)
from scptoolbox_tpu.ops.ipm import IPMStatus


@pytest.mark.parametrize("choice", [1, 2])
def test_lcvx_matches_pontryagin(choice):
    mdl = LCvxDoubleIntegratorParameters(choice=choice)
    sol = solve_lcvx(mdl)
    assert sol.status in (int(IPMStatus.OPTIMAL), int(IPMStatus.ALMOST_OPTIMAL))
    # boundary conditions
    assert np.allclose(sol.x[0], [0.0, 0.0], atol=1e-6)
    assert np.allclose(sol.x[-1], [mdl.s, 0.0], atol=1e-5)
    # losslessness: |u| = sigma at the optimum (definition.jl LCvx theory)
    assert np.max(np.abs(np.abs(sol.u) - sol.sigma)) < 1e-4
    # annulus recovered: 1 <= |u| <= 2
    assert np.all(np.abs(sol.u) >= 1.0 - 1e-5)
    assert np.all(np.abs(sol.u) <= 2.0 + 1e-5)

    # analytic cross-check (reference solve_mp, definition.jl:137-217)
    check_cost(f"lcvx_double_integrator_{choice}", sol.cost, rel=1e-4)
    mp = solve_mp(mdl)
    assert mp["err"] <= 1e-2
    x_mp = np.stack([np.interp(sol.t, mp["t"], mp["x"][:, i])
                     for i in range(2)], axis=1)
    err = np.max(np.abs(sol.x - x_mp)) / mdl.s
    assert err < 2e-2, f"LCvx vs Pontryagin trajectory mismatch: {err}"
