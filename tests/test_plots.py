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


def _fake_sol(nx, nu, N=12, seed=1):
    rng = np.random.default_rng(seed)
    t = np.linspace(0, 1, N)
    xd = np.cumsum(rng.normal(size=(N, nx)) * 0.2, axis=0)
    return SCPSolution(
        status=SCPStatus.SOLVED, algorithm="ptr", iterations=4,
        xd=xd, ud=rng.normal(size=(N, nu)), p=np.asarray([1.0]),
        cost=1.0, t_grid=t, feas=True, history=[],
        t_cont=np.linspace(0, 1, 4 * N),
        x_cont=np.repeat(xd, 4, axis=0)[: 4 * N])


def test_example_plot_suites(tmp_path):
    """Per-example plot suites (reference test/examples/*/plots.jl) render
    against synthetic solutions of each problem's state/input shape."""
    import jax.numpy as jnp

    from scptoolbox_tpu.utils import example_plots as ep

    px = str(tmp_path / "p")
    ep.plot_double_integrator(_fake_sol(2, 1), prefix=px)
    ep.plot_rocket_landing(_fake_sol(7, 3), prefix=px)
    ep.plot_oscillator(_fake_sol(2, 1), prefix=px)
    obs = [Ellipsoid(jnp.eye(3), jnp.asarray([1.0, 1.0, 0.0]))]
    ep.plot_quadrotor(_fake_sol(6, 4), obs, prefix=px)
    rooms = [Hyperrectangle.from_ranges((-1, 1), (-1, 1), (-1, 1))]
    ep.plot_freeflyer(_fake_sol(13, 6), rooms, obs, prefix=px)
    ep.plot_starship(_fake_sol(8, 3), prefix=px)
    ep.plot_rendezvous(_fake_sol(6, 12), prefix=px, name="rdv")

    made = sorted(p.name for p in tmp_path.iterdir())
    for want in ("p_double_integrator.png", "p_rocket_landing.png",
                 "p_oscillator.png", "p_quadrotor_traj.png",
                 "p_quadrotor_inputs.png", "p_freeflyer_traj.png",
                 "p_freeflyer_qnorm.png", "p_freeflyer_3d.png",
                 "p_starship_traj.png", "p_starship_inputs.png",
                 "p_rdv_approach.png", "p_rdv_impulses.png"):
        assert want in made, (want, made)
        assert (tmp_path / want).stat().st_size > 1000
