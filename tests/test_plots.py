"""Plotting smoke tests (the reference wraps every example's plot suite in
try/catch as CI smoke tests, e.g. starship tests.jl:153-162; here rendering
failures DO fail, but against tiny synthetic data)."""

import numpy as np
import pytest

from scptoolbox_tpu.solvers.solution import IterationRecord, SCPSolution
from scptoolbox_tpu.config import SCPStatus
from scptoolbox_tpu.utils.geometry import Ellipsoid, Hyperrectangle
from scptoolbox_tpu.utils import plots


def _fake_history(n_iter=5, seed=0):
    rng = np.random.default_rng(seed)
    recs = []
    x_star = rng.normal(size=(4, 2))
    for i in range(n_iter):
        recs.append(IterationRecord(
            iteration=i + 1,
            x=x_star + 0.5 ** i * rng.normal(size=(4, 2)),
            u=rng.normal(size=(4, 1)), p=np.asarray([1.0]),
            J_aug=1.0, J_orig=1.0, feas=True, deviation=0.5 ** i,
            improv_rel=0.1, ipm_status=0, ipm_iters=10,
            defect_norm=1e-6, vd_norm=0.0, vs_norm=0.0,
            timing={"total": 0.1 + 0.01 * i}))
    return recs


def test_convergence_single(tmp_path):
    fig = plots.plot_convergence(_fake_history(), "unit",
                                 path=str(tmp_path / "conv.png"))
    assert (tmp_path / "conv.png").exists()
    assert len(fig.axes) == 1


def test_convergence_trials(tmp_path):
    hists = [_fake_history(seed=s) for s in range(3)]
    fig = plots.plot_convergence(hists, "unit",
                                 path=str(tmp_path / "conv3.png"))
    assert (tmp_path / "conv3.png").exists()
    assert len(fig.axes) == 2


def test_trajectory_2d(tmp_path):
    import jax.numpy as jnp

    t = np.linspace(0, 1, 8)
    xd = np.stack([np.cos(t), np.sin(t)], axis=1)
    sol = SCPSolution(
        status=SCPStatus.SOLVED, algorithm="ptr", iterations=3,
        xd=xd, ud=np.zeros((8, 1)), p=np.asarray([1.0]), cost=0.0,
        t_grid=t, feas=True, history=[],
        t_cont=np.linspace(0, 1, 50),
        x_cont=np.stack([np.cos(np.linspace(0, 1, 50)),
                         np.sin(np.linspace(0, 1, 50))], axis=1))
    obs = [Ellipsoid(jnp.eye(2) * 4.0, jnp.asarray([0.2, 0.2]))]
    rooms = [Hyperrectangle.from_ranges((-1.5, 1.5), (-1.5, 1.5))]
    fig = plots.plot_trajectory_2d(sol, obstacles=obs, prisms=rooms,
                                   path=str(tmp_path / "traj.png"))
    assert (tmp_path / "traj.png").exists()
