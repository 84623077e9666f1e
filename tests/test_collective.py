"""shard_map + psum collective solve on the 8-device virtual CPU mesh:
the global convergence vote must stop the fleet early and match the
plain vmapped batched path per scenario (SURVEY.md §5 distributed row)."""

import jax.numpy as jnp
import numpy as np
import pytest

from scptoolbox_tpu.config import SCPStatus
from scptoolbox_tpu.models.double_integrator import (
    DoubleIntegratorParameters, double_integrator)
from scptoolbox_tpu.parallel import make_mesh, solve_batched_collective
from scptoolbox_tpu.solvers import ptr


def test_collective_vote_matches_vmapped():
    pbm = double_integrator(DoubleIntegratorParameters(drag=True, g=0.01,
                                                       s=30.0))
    pars = ptr.PTRParameters(N=31, Nsub=15, wvc=1e3, wtr=5e-3)
    solver = ptr.PTR(pbm, pars)
    gx, gu, gp = solver._guess
    B = 8
    scale = (1.0 + 0.1 * (jnp.arange(B) / B - 0.5))[:, None, None]
    bx = gx[None] * scale
    bu = jnp.broadcast_to(gu, (B, *gu.shape))
    bp = jnp.broadcast_to(gp, (B, *gp.shape))

    mesh = make_mesh(8)
    n_iters = 10
    res = solve_batched_collective(solver, bx, bu, bp, n_iters, mesh=mesh)

    assert int(res.n_feasible) == B
    assert np.all(np.asarray(res.status) == int(SCPStatus.SOLVED))
    # the psum vote stopped the whole fleet before the budget
    assert int(res.outer_iters) < n_iters
    assert int(res.outer_iters) == int(np.max(np.asarray(res.iters)))
    assert int(res.total_iters) == int(np.sum(np.asarray(res.iters)))

    # per-scenario parity with the plain vmapped batched path
    out = solver.solve_batched(bx, bu, bp, n_iters)
    assert np.asarray(res.J_aug) == pytest.approx(
        np.asarray(out["J_aug"]), rel=1e-8)
    assert np.asarray(res.iters).tolist() == np.asarray(
        out["iters"]).tolist()


def test_collective_2d_host_batch_mesh():
    """2-D (host x batch) mesh: the convergence-vote psum reduces over
    BOTH axes (DCN across hosts + ICI within a host on real hardware) and
    matches the 1-D result (VERDICT r2 #6: multi-host collective
    machinery, simulated as 2 hosts x 4 chips on the virtual mesh)."""
    from scptoolbox_tpu.parallel import make_mesh_2d

    pbm = double_integrator(DoubleIntegratorParameters(drag=True, g=0.01,
                                                       s=30.0))
    pars = ptr.PTRParameters(N=21, Nsub=10, wvc=1e3, wtr=5e-3)
    solver = ptr.PTR(pbm, pars)
    gx, gu, gp = solver._guess
    B = 8
    scale = (1.0 + 0.1 * (jnp.arange(B) / B - 0.5))[:, None, None]
    bx = gx[None] * scale
    bu = jnp.broadcast_to(gu, (B, *gu.shape))
    bp = jnp.broadcast_to(gp, (B, *gp.shape))

    mesh2 = make_mesh_2d(n_hosts=2, n_per_host=4)
    assert mesh2.axis_names == ("host", "batch")
    res2 = solve_batched_collective(solver, bx, bu, bp, 10, mesh=mesh2)
    res1 = solve_batched_collective(solver, bx, bu, bp, 10,
                                    mesh=make_mesh(8))
    assert int(res2.n_feasible) == B
    assert np.all(np.asarray(res2.status) == int(SCPStatus.SOLVED))
    # the psum over ("host", "batch") must agree with the 1-D vote
    assert int(res2.outer_iters) == int(res1.outer_iters)
    assert int(res2.total_iters) == int(res1.total_iters)
    assert np.asarray(res2.J_aug) == pytest.approx(
        np.asarray(res1.J_aug), rel=1e-8)


def test_collective_starship_class_staged_cr():
    """Collective vote on the north-star model family (starship flip:
    np=10, SOC-heavy rows) with the cyclic-reduction staged KKT — the TPU
    production configuration, validated on the virtual mesh at small N
    (VERDICT r4 item 6: the distributed machinery must be exercised on
    the structure the throughput claim is made on)."""
    from scptoolbox_tpu.models.starship_flip import (StarshipParameters,
                                                     starship)

    pbm = starship(StarshipParameters(), N=9)
    pars = ptr.PTRParameters(N=9, Nsub=6, wvc=1e3, wtr=0.1,
                             ipm_tol=1e-8, ipm_max_iter=60,
                             kkt_method="staged_cr")
    solver = ptr.PTR(pbm, pars)
    assert solver._kkt_builder is not None, "stage probe must succeed"
    gx, gu, gp = solver._guess
    B = 8
    scale = (1.0 + 0.02 * (jnp.arange(B) / B - 0.5))[:, None, None]
    bx = gx[None] * scale
    bu = jnp.broadcast_to(gu, (B, *gu.shape))
    bp = jnp.broadcast_to(gp, (B, *gp.shape))

    res = solve_batched_collective(solver, bx, bu, bp, 4, mesh=make_mesh(8))
    assert np.all(np.isfinite(np.asarray(res.J_aug)))
    # per-scenario parity with the plain vmapped batched path
    out = solver.solve_batched(bx, bu, bp, 4)
    assert np.asarray(res.J_aug) == pytest.approx(
        np.asarray(out["J_aug"]), rel=1e-6)
