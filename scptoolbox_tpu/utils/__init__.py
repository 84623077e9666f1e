"""Math/utility kernels (capability parity with reference src/utils/)."""

from scptoolbox_tpu.utils import quaternion
from scptoolbox_tpu.utils.geometry import (
    Ellipsoid,
    Hyperrectangle,
    skew,
    homtransf,
    hominv,
    homdisp,
    homrot,
)
from scptoolbox_tpu.utils.interp import (
    linterp,
    zohinterp,
    diracinterp,
    straightline_interpolate,
)
from scptoolbox_tpu.utils.integrate import rk4, rk4_grid, trapz, grad_trapz
from scptoolbox_tpu.utils.smooth import (
    logsumexp,
    sigmoid,
    indicator,
    smooth_or,
    Homotopy,
)
from scptoolbox_tpu.utils.search import golden
from scptoolbox_tpu.utils.tree import TreeNode, find_common
from scptoolbox_tpu.utils.checkpoint import (load_solution, load_state,
                                             save_solution, save_state)
from scptoolbox_tpu.utils.linsys import c2d_zoh, c2d_foh
from scptoolbox_tpu.utils.trajectory import ContinuousTimeTrajectory, sample

__all__ = [
    "quaternion",
    "Ellipsoid",
    "Hyperrectangle",
    "skew",
    "homtransf",
    "hominv",
    "homdisp",
    "homrot",
    "linterp",
    "zohinterp",
    "diracinterp",
    "straightline_interpolate",
    "rk4",
    "rk4_grid",
    "trapz",
    "grad_trapz",
    "logsumexp",
    "sigmoid",
    "indicator",
    "smooth_or",
    "Homotopy",
    "golden",
    "TreeNode",
    "find_common",
    "load_solution",
    "load_state",
    "save_solution",
    "save_state",
    "c2d_zoh",
    "c2d_foh",
    "ContinuousTimeTrajectory",
    "sample",
]
