"""Batched-solver tests: per-scenario early stop and SCP status for PTR,
and the batched SCvx accept/reject state machine matching the serial
solver per-scenario (round-3 parity items; the reference's trials loop,
quadrotor tests.jl:160-202, re-solves serially)."""

import jax.numpy as jnp
import numpy as np
import pytest

from scptoolbox_tpu.config import SCPStatus
from scptoolbox_tpu.models.double_integrator import (
    DoubleIntegratorParameters, double_integrator)
from scptoolbox_tpu.models.quadrotor import QuadrotorParameters, quadrotor
from scptoolbox_tpu.solvers import ptr, scvx


def test_ptr_batched_status_and_early_stop():
    pbm = double_integrator(DoubleIntegratorParameters(drag=True, g=0.01,
                                                       s=30.0))
    pars = ptr.PTRParameters(N=31, Nsub=15, wvc=1e3, wtr=5e-3)
    solver = ptr.PTR(pbm, pars)
    gx, gu, gp = solver._guess
    B = 4
    scale = (1.0 + 0.1 * (jnp.arange(B) / B - 0.5))[:, None, None]
    bx = gx[None] * scale
    bu = jnp.broadcast_to(gu, (B, *gu.shape))
    bp = jnp.broadcast_to(gp, (B, *gp.shape))
    n_iters = 8
    out = solver.solve_batched(bx, bu, bp, n_iters)
    assert np.all(np.asarray(out["status"]) == int(SCPStatus.SOLVED))
    assert np.all(np.asarray(out["feas"]))
    # early stop: the serial solver converges in ~3 iterations, so every
    # scenario must stop well before the n_iters budget
    iters = np.asarray(out["iters"])
    assert np.all(iters < n_iters), iters
    # frozen scenarios stop consuming IPM iterations: after all scenarios
    # are done the remaining scan steps show no active lanes
    active = np.asarray(out["traces"]["active"])  # (<=n_iters, B)
    if active.shape[0] == n_iters:
        # device-resident scan path (small subproblems): the budget runs
        # on device but converged scenarios show no active lanes
        assert not active[-1].any()
    else:
        # host-loop path (large subproblems): the loop breaks once every
        # scenario is done, so the trace is SHORTER than the budget
        assert active.shape[0] >= int(iters.max())

    # serial cross-check on the unperturbed scenario
    serial = solver.solve()
    k = B // 2  # scale == 1 scenario
    assert float(out["J_aug"][k]) == pytest.approx(
        serial.history[-1].J_aug, rel=1e-6)


def test_scvx_batched_matches_serial():
    mdl = QuadrotorParameters()
    pbm = quadrotor(mdl)
    pars = scvx.SCvxParameters(N=30, Nsub=15, lam=30.0, iter_max=15,
                               project_guess=False)
    solver = scvx.SCvx(pbm, pars)
    gx, gu, gp = solver._guess
    B = 2
    bx = jnp.broadcast_to(gx, (B, *gx.shape))
    bu = jnp.broadcast_to(gu, (B, *gu.shape))
    bp = jnp.broadcast_to(gp, (B, *gp.shape))
    out = solver.solve_batched(bx, bu, bp, pars.iter_max)
    serial = solver.solve()

    assert np.all(np.asarray(out["status"]) == int(SCPStatus.SOLVED))
    assert np.all(np.asarray(out["feas"]))
    # identical guess -> identical per-scenario solution, matching serial
    assert np.allclose(np.asarray(out["x"][0]), np.asarray(out["x"][1]))
    assert np.asarray(out["x"][0]) == pytest.approx(serial.xd, abs=1e-6)
    assert float(out["iters"][0]) == serial.iterations
    # eta adaptation happened on-device: trace shows the serial eta path
    etas = np.asarray(out["traces"]["eta"])[:, 0]
    serial_etas = [r.extras["eta"] for r in serial.history]
    assert etas[: len(serial_etas)] == pytest.approx(serial_etas)


def test_gusto_batched_matches_serial():
    """The branch-free batched lambda/eta/kappa ladder (gusto.py
    _solve_batched_impl) reproduces the serial host update rule
    (reference gusto.jl:1310-1427) scenario-by-scenario: identical
    guesses must follow the serial eta/lam trace exactly and land on the
    serial solution."""
    from scptoolbox_tpu.solvers import gusto

    mdl = QuadrotorParameters()
    pbm = quadrotor(mdl)
    pars = gusto.GuSTOParameters(N=30, Nsub=15, iter_max=15)
    solver = gusto.GuSTO(pbm, pars)
    gx, gu, gp = solver._guess
    B = 2
    bx = jnp.broadcast_to(gx, (B, *gx.shape))
    bu = jnp.broadcast_to(gu, (B, *gu.shape))
    bp = jnp.broadcast_to(gp, (B, *gp.shape))
    out = solver.solve_batched(bx, bu, bp, pars.iter_max)
    serial = solver.solve()

    assert serial.status == SCPStatus.SOLVED
    assert np.all(np.asarray(out["status"]) == int(SCPStatus.SOLVED))
    assert np.all(np.asarray(out["feas"]))
    assert np.allclose(np.asarray(out["x"][0]), np.asarray(out["x"][1]))
    # batched and serial reduce in different op orders; agreement is to
    # roundoff of the converged iterate, not bitwise
    assert np.asarray(out["x"][0]) == pytest.approx(serial.xd, abs=5e-5)
    assert float(out["J_aug"][0]) == pytest.approx(
        serial.history[-1].J_aug, rel=1e-5)
    assert float(out["iters"][0]) == serial.iterations
    # the per-scenario lambda ladder and eta adaptation ran on-device and
    # match the serial host loop's recorded path
    active = np.asarray(out["traces"]["active"])[:, 0]
    n_active = int(active.sum())
    for key in ("eta", "lam"):
        dev = np.asarray(out["traces"][key])[:n_active, 0]
        ser = [r.extras[key] for r in serial.history]
        assert dev == pytest.approx(ser[: len(dev)], rel=1e-5), key
