"""Oscillator deadband example acceptance tests (reference
test/examples/oscillator/tests.jl:21-93)."""

import numpy as np
import pytest

from tests.costcheck import check_cost

from scptoolbox_tpu.config import SCPStatus
from scptoolbox_tpu.models.oscillator import (OscillatorParameters,
                                              solve_oscillator)


@pytest.fixture(scope="module")
def sol():
    return solve_oscillator(N=30, n_hom=10)


def test_converges(sol):
    assert sol.status == SCPStatus.SOLVED
    check_cost("oscillator_ptr", sol.cost)


def test_deadband_logic(sol):
    """At the final homotopy sharpness the discrete actuator logic holds:
    aa = 0 inside the deadband, aa = ar outside."""
    mdl = OscillatorParameters()
    u = np.asarray(sol.ud)
    aa, ar = u[:, 0], u[:, 1]
    inside = np.abs(ar) < mdl.a_db
    if inside.any():
        assert np.abs(aa[inside]).max() <= 1e-6
    outside = ~inside
    if outside.any():
        assert np.abs((aa - ar)[outside]).max() <= 1e-6
    assert np.abs(aa).max() <= mdl.a_max + 1e-8


def test_comes_to_rest(sol):
    """The L1 position cost drives the oscillator to the origin."""
    x = np.asarray(sol.xd)
    assert abs(x[-1, 0]) <= 1e-3
    assert abs(x[-1, 1]) <= 1e-3
    # initial condition respected
    assert np.allclose(x[0], [1.0, 0.0], atol=1e-6)
