"""SCP solution and history containers (reference src/solvers/scp.jl:105-124
`SCPSolution` / `SCPHistory` and :196-245 conversion incl. continuous-time
propagation)."""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional

import numpy as np

from scptoolbox_tpu.config import SCPStatus


@dataclasses.dataclass
class IterationRecord:
    """Per-iteration record (reference keeps every subproblem in
    SCPHistory, scp.jl:122-124, with timing scp.jl:990-995)."""

    iteration: int
    x: np.ndarray
    u: np.ndarray
    p: np.ndarray
    J_aug: float
    J_orig: float
    feas: bool
    deviation: float
    improv_rel: float
    ipm_status: int
    ipm_iters: int
    defect_norm: float
    vd_norm: float = 0.0
    vs_norm: float = 0.0
    extras: Dict[str, Any] = dataclasses.field(default_factory=dict)
    timing: Dict[str, float] = dataclasses.field(default_factory=dict)


@dataclasses.dataclass
class SCPSolution:
    """Converged (or final) SCP solution (reference scp.jl:105-124).

    `status` uses the reference naming via str(), e.g. "SCP_SOLVED".
    """

    status: SCPStatus
    algorithm: str
    iterations: int
    xd: np.ndarray            # (N, nx) discrete-time states
    ud: np.ndarray            # (N, nu) discrete-time inputs
    p: np.ndarray             # (np,) parameters
    cost: float               # converged original cost J_orig
    t_grid: np.ndarray        # (N,) normalized node times
    feas: bool
    history: List[IterationRecord] = dataclasses.field(default_factory=list)
    t_cont: Optional[np.ndarray] = None   # fine-grid replay (propagate)
    x_cont: Optional[np.ndarray] = None
    extras: Dict[str, Any] = dataclasses.field(default_factory=dict)

    @property
    def status_str(self) -> str:
        return str(self.status)

    @property
    def converged(self) -> bool:
        return self.status == SCPStatus.SOLVED
