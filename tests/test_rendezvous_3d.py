"""Apollo CSM 3D rendezvous end-to-end test (reference
rendezvous_3d/tests.jl:22-110: PTR + IMPULSE + callback-driven homotopy
ladder must solve; runtests.jl:73-78). Checks the CSM thruster geometry,
docking tolerances, impulse bounds, and the minimum-impulse-bit logic."""

import os

import numpy as np
import pytest

from tests.costcheck import check_cost

from scptoolbox_tpu.config import SCPStatus
from scptoolbox_tpu.models.rendezvous_3d import (ID_DOCK_TOL, ID_RCS,
                                                 Rendezvous3DParameters,
                                                 apollo_csm_geometry,
                                                 rendezvous_3d,
                                                 solve_rendezvous_3d)


def test_csm_geometry():
    """Thruster geometry sanity (reference parameters.jl:107-200): 16 unit
    thrust directions, four quads at equal radius from the x-axis of the
    structural frame, nozzles canted 10 degrees."""
    r_rcs, f_rcs, H_DP = apollo_csm_geometry()
    assert r_rcs.shape == (16, 3) and f_rcs.shape == (16, 3)
    assert np.allclose(np.linalg.norm(f_rcs, axis=1), 1.0, atol=1e-12)
    # docking port ahead of the CoM along +x in the D frame
    assert H_DP[0, 3] > 0
    # pitch-forward nozzles (quad order pf,pa,rf,ra) thrust mostly along -x
    # (they push the craft forward along +x): reaction force f = -exhaust
    pf = f_rcs[[0, 4, 8, 12]]
    assert np.all(np.abs(np.abs(pf[:, 0]) - np.cos(np.deg2rad(10))) < 1e-9)


@pytest.fixture(scope="module")
def sol():
    # reduced N/homotopy for the CPU suite (reference: N=25, 10 stages).
    # The full reference config VERIFIED CONVERGING end to end:
    # SCP_SOLVED + feasible, cost 0.92120, 38 iterations through all 10
    # homotopy rungs, 64 min on this 2-core box (round 4) — too slow for
    # CI, exposed as the opt-in SCP_SLOW test below. (The finer grid +
    # full ladder reach a better optimum than the N=15/5 pin, 0.921 vs
    # 1.527, as expected for the sharper minimum-impulse-bit logic.)
    mdl = Rendezvous3DParameters(hom_steps=5)
    return solve_rendezvous_3d(N=15, mdl=mdl)


@pytest.mark.skipif(not os.environ.get("SCP_SLOW"),
                    reason="reference-config run (~2 h on 2 CPUs); "
                           "set SCP_SLOW=1 to enable")
def test_solves_reference_config():
    """Full reference configuration (rendezvous_3d tests.jl:22-61):
    N=25 nodes, 10 homotopy stages."""
    mdl = Rendezvous3DParameters(hom_steps=10)
    sol = solve_rendezvous_3d(N=25, mdl=mdl)
    assert sol.status == SCPStatus.SOLVED
    assert sol.feas


def test_solves(sol):
    assert sol.status == SCPStatus.SOLVED
    assert sol.feas
    check_cost("rendezvous_3d_ptr", sol.cost)


def test_docking(sol):
    mdl = Rendezvous3DParameters()
    rf, qf = mdl.terminal_pose()
    xf = sol.xd[-1]
    dtol = np.asarray(sol.p[ID_DOCK_TOL])
    # position within the docking tolerance box, exact along the axis
    assert np.linalg.norm(xf[:3] + dtol[:3] - np.asarray(rf)) < 1e-4
    assert np.all(np.abs(dtol[:3]) <= mdl.rf_tol + 1e-6)
    assert abs(dtol[0]) < 1e-6
    # attitude within the angular tolerance
    qf_np = np.asarray(qf)
    ang = 2.0 * np.arccos(np.clip(abs(float(np.dot(xf[6:10], qf_np))),
                                  -1.0, 1.0))
    assert ang <= np.deg2rad(mdl.ang_tol_deg) + 1e-3
    # unit quaternion throughout
    assert np.allclose(np.linalg.norm(sol.xd[:, 6:10], axis=1), 1.0,
                       atol=1e-6)


def test_impulse_bounds_and_mib(sol):
    mdl = Rendezvous3DParameters()
    f = np.asarray(sol.ud[:, ID_RCS])
    assert np.all(f >= -1e-6)
    assert np.all(f <= mdl.imp_max + 1e-5)
    # minimum impulse bit at the final homotopy sharpness: impulses are
    # either (near) zero or above ~imp_min (definition.jl:587-624)
    firing = f > 0.2 * mdl.imp_min
    assert np.all(f[firing] >= 0.5 * mdl.imp_min)
