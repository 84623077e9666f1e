"""Bundled benchmark problems (reference test/examples/*, SURVEY.md
section 2.6): each module builds a TrajectoryProblem (or a direct
ConicProgram for the LCvx examples) plus a solve entry point."""

from scptoolbox_tpu.models.double_integrator import (
    DoubleIntegratorParameters, double_integrator)
from scptoolbox_tpu.models.freeflyer import FreeFlyerParameters, freeflyer
from scptoolbox_tpu.models.oscillator import (OscillatorParameters,
                                              oscillator, solve_oscillator)
from scptoolbox_tpu.models.quadrotor import QuadrotorParameters, quadrotor
from scptoolbox_tpu.models.rendezvous_3d import (Rendezvous3DParameters,
                                                 rendezvous_3d,
                                                 solve_rendezvous_3d)
from scptoolbox_tpu.models.rendezvous_planar import (
    PlanarRendezvousParameters, rendezvous_planar, solve_rendezvous_planar)
from scptoolbox_tpu.models.rocket_landing import Rocket, solve_lcvx
from scptoolbox_tpu.models.starship_flip import StarshipParameters, starship

__all__ = [
    "DoubleIntegratorParameters", "double_integrator",
    "FreeFlyerParameters", "freeflyer",
    "OscillatorParameters", "oscillator", "solve_oscillator",
    "QuadrotorParameters", "quadrotor",
    "Rendezvous3DParameters", "rendezvous_3d", "solve_rendezvous_3d",
    "PlanarRendezvousParameters", "rendezvous_planar",
    "solve_rendezvous_planar",
    "Rocket", "solve_lcvx",
    "StarshipParameters", "starship",
]
