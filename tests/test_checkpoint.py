"""Checkpoint/resume (utils/checkpoint.py): round-trip serialization of
SCPSolution, and cross-process-style warm_start resume — the disk-backed
extension of the reference's in-memory warm_start (scp.jl:532-539)."""

import os

import numpy as np
import pytest

from scptoolbox_tpu.config import SCPStatus
from scptoolbox_tpu.models.double_integrator import double_integrator
from scptoolbox_tpu.solvers import ptr
from scptoolbox_tpu.utils.checkpoint import (load_solution, load_state,
                                             save_solution, save_state)


def test_state_roundtrip(tmp_path):
    path = os.path.join(tmp_path, "state.npz")
    state = {"x": np.arange(6.0).reshape(2, 3), "eta": 0.25,
             "rung": 3, "algo": "ptr", "done": False}
    save_state(path, state)
    back = load_state(path)
    np.testing.assert_array_equal(back["x"], state["x"])
    assert back["eta"] == 0.25 and back["rung"] == 3
    assert back["algo"] == "ptr" and back["done"] is False


def test_solution_roundtrip_and_resume(tmp_path):
    pbm = double_integrator()
    pars = ptr.PTRParameters(N=15, Nsub=8, iter_max=6, wvc=1e3, wtr=5e-3)
    solver = ptr.PTR(pbm, pars)
    sol = solver.solve()
    assert sol.status == SCPStatus.SOLVED

    path = os.path.join(tmp_path, "sol.npz")
    save_solution(path, sol)
    back = load_solution(path)
    assert back.status == SCPStatus.SOLVED
    assert back.algorithm == sol.algorithm
    assert float(back.cost) == pytest.approx(float(sol.cost))
    np.testing.assert_allclose(back.xd, sol.xd)
    np.testing.assert_allclose(back.ud, sol.ud)
    assert len(back.history) == len(sol.history)
    assert back.history[-1].ipm_iters == sol.history[-1].ipm_iters
    np.testing.assert_allclose(back.x_cont, sol.x_cont)

    # resume: warm-starting from the loaded checkpoint converges
    # immediately (the reference's warm_start semantics, scp.jl:532-539,
    # now across processes)
    sol2 = ptr.PTR(pbm, pars).solve(warm=back)
    assert sol2.status == SCPStatus.SOLVED
    assert sol2.iterations <= 2
    assert float(sol2.cost) == pytest.approx(float(sol.cost), rel=1e-4)
