"""Rocket-landing LCvx acceptance tests (reference
test/examples/rocket_landing/tests.jl:23-55)."""

import math

import numpy as np
import pytest

from tests.costcheck import check_cost

from scptoolbox_tpu.models import rocket_landing as rl
from scptoolbox_tpu.ops.ipm import IPMStatus

N = 60


@pytest.fixture(scope="module")
def pdg():
    rocket = rl.Rocket()
    # coarse golden tolerance keeps the test fast; the public API default
    # matches the reference's 1e-3
    sol = rl.solve_lcvx(rocket, N=N, tol=0.5)
    return rocket, sol


def test_converges(pdg):
    _, sol = pdg
    assert sol.status == int(IPMStatus.OPTIMAL)
    assert math.isfinite(sol.cost)
    check_cost("rocket_landing_lcvx", sol.cost, rel=1e-4)


def test_boundary_conditions(pdg):
    rocket, sol = pdg
    assert np.allclose(sol.r[0], rocket.r0, atol=1e-4)
    assert np.allclose(sol.v[0], rocket.v0, atol=1e-4)
    assert np.allclose(sol.r[-1], 0.0, atol=1e-3)
    assert np.allclose(sol.v[-1], 0.0, atol=1e-3)
    # lands with no less than dry mass
    assert sol.m[-1] >= rocket.m_dry - 1e-3
    assert sol.m[0] == pytest.approx(rocket.m_wet, rel=1e-6)


def test_lcvx_tight(pdg):
    """Lossless convexification: the relaxation xi >= ||u|| is tight at the
    optimum (the LCvx guarantee the example demonstrates)."""
    _, sol = pdg
    gap = sol.xi - np.linalg.norm(sol.u, axis=1)
    assert gap.min() >= -1e-6
    assert gap.max() <= 1e-3 * np.max(sol.xi)


def test_thrust_annulus(pdg):
    """Recovered thrust respects the nonconvex annulus rho_min<=|T|<=rho_max
    (the original pre-relaxation constraint)."""
    rocket, sol = pdg
    assert sol.T_nrm.max() <= rocket.rho_max * (1 + 1e-2)
    assert sol.T_nrm.min() >= rocket.rho_min * (1 - 1e-2)


def test_pointing_and_glide_slope(pdg):
    rocket, sol = pdg
    assert np.degrees(sol.gamma).max() <= rocket.gamma_p_deg + 0.5
    g_gs = math.radians(rocket.gamma_gs_deg)
    # glide slope: |r_xy| cos(g) <= r_z sin(g) + slack
    lat = np.abs(sol.r[:, :2]) * math.cos(g_gs)
    vert = sol.r[:, 2:3] * math.sin(g_gs)
    assert (lat - vert).max() <= 1e-3 * max(1.0, np.abs(sol.r).max())


def test_simulation_lands(pdg):
    """Closed-loop continuous replay of the ZOH thrust reaches the pad
    (reference simulate, definition.jl:206-260)."""
    rocket, sol = pdg
    ts, X = rl.simulate(rocket, sol, dt=0.05)
    # the plan is exact ZOH in acceleration but the replay holds THRUST
    # constant while mass depletes within each interval (as in the
    # reference), so a small model-mismatch drift is expected
    assert np.linalg.norm(X[-1, 0:3]) <= 100.0    # meters, of a 2.5 km descent
    assert np.linalg.norm(X[-1, 3:6]) <= 5.0      # m/s
    assert math.exp(X[-1, 6]) >= rocket.m_dry - 1.0
