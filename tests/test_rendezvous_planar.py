"""Planar rendezvous end-to-end test (reference rendezvous_planar/tests.jl:
PTR + IMPULSE discretization + deadband homotopy ladder must solve;
runtests.jl:66-71). Checks docking boundary conditions, thrust bounds, and
the deadband logic at the final (sharpest) homotopy stage."""

import numpy as np
import pytest

from tests.costcheck import check_cost

from scptoolbox_tpu.config import SCPStatus
from scptoolbox_tpu.models.rendezvous_planar import (
    PlanarRendezvousParameters, solve_rendezvous_planar)


@pytest.fixture(scope="module")
def sol():
    # reduced grid/homotopy resolution to keep the CPU suite fast; the
    # reference configuration (N=30, 10 stages) is the model default
    return solve_rendezvous_planar(N=20, n_hom=5)


def test_solves(sol):
    assert sol.status == SCPStatus.SOLVED
    assert sol.feas
    check_cost("rendezvous_planar_ptr", sol.cost)


def test_boundary_conditions(sol):
    mdl = PlanarRendezvousParameters()
    x0 = sol.xd[0]
    assert np.allclose(x0[:2], mdl.r0, atol=1e-6)
    assert abs(x0[4] - mdl.theta0) < 1e-6
    xf = sol.xd[-1]
    # dock at the origin, approaching at -vf x_hat, upright
    assert np.linalg.norm(xf[:2]) < 1e-4
    assert abs(xf[2] + mdl.vf) < 1e-4
    assert abs(xf[4]) < 1e-4


def test_thrust_bounds(sol):
    mdl = PlanarRendezvousParameters()
    f = sol.ud[:, 0:3]
    assert np.all(np.abs(f) <= mdl.f_max + 1e-5)
    # flight time in bounds
    assert mdl.tf_min - 1e-6 <= sol.p[0] <= mdl.tf_max + 1e-6


def test_deadband_respected(sol):
    """At the sharpest homotopy stage, actual forces are (approximately)
    zero inside the deadband and track the reference outside it
    (reference definition.jl:337-413)."""
    mdl = PlanarRendezvousParameters()
    f = np.asarray(sol.ud[:, 0:3]).ravel()
    fr = np.asarray(sol.ud[:, 3:6]).ravel()
    inside = np.abs(fr) < 0.8 * mdl.f_db
    outside = np.abs(fr) > 1.2 * mdl.f_db
    tol = 0.05 * mdl.f_max
    assert np.all(np.abs(f[inside]) < tol)
    assert np.all(np.abs(f[outside] - fr[outside]) < tol)
