"""Checkpoint/resume: serialize SCP solver state to disk.

The reference has NO disk persistence (SURVEY.md §5 checkpoint row) — its
resume story is the in-memory `warm_start(sol)` (reference scp.jl:532-539)
plus the homotopy callback keeping state across rungs. Here the same
warm-start state is a small pytree, so checkpointing is a flat .npz:

  * `save_solution` / `load_solution`: a full SCPSolution (trajectory,
    history, continuous-time replay), loadable as the `warm=` argument of
    any solver's `solve()` — cross-process resume of the reference's
    warm_start semantics;
  * `save_state` / `load_state`: any flat dict of arrays/scalars (e.g.
    a homotopy ladder position + trust-region radii mid-solve).

Format: numpy .npz with a JSON sidecar entry for scalar metadata — no
pickle, so checkpoints are portable and safe to load.
"""

from __future__ import annotations

import json
from typing import Any, Dict

import numpy as np

from scptoolbox_tpu.config import SCPStatus
from scptoolbox_tpu.solvers.solution import IterationRecord, SCPSolution

_META_KEY = "__meta_json__"


def _norm_path(path) -> str:
    """np.savez silently appends '.npz' to extension-less paths; normalize
    in BOTH save and load so save_state('ckpt')/load_state('ckpt')
    round-trips."""
    path = str(path)
    return path if path.endswith(".npz") else path + ".npz"


def save_state(path: str, state: Dict[str, Any]) -> None:
    """Save a flat dict of arrays / scalars / strings to `path` (.npz)."""
    path = _norm_path(path)
    arrays = {}
    meta = {}
    for k, v in state.items():
        assert k != _META_KEY, f"reserved key {k}"
        if isinstance(v, (str, bool, int, float)) or v is None:
            meta[k] = v
        else:
            arrays[k] = np.asarray(v)
    np.savez(path, **arrays, **{_META_KEY: np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8)})


def load_state(path: str) -> Dict[str, Any]:
    """Inverse of save_state."""
    out: Dict[str, Any] = {}
    with np.load(_norm_path(path), allow_pickle=False) as data:
        for k in data.files:
            if k == _META_KEY:
                out.update(json.loads(bytes(data[k]).decode()))
            else:
                out[k] = data[k]
    return out


def save_solution(path: str, sol: SCPSolution) -> None:
    """Serialize an SCPSolution (including per-iteration history) so a
    later process can `solver.solve(warm=load_solution(path))`.

    Not persisted (by design — they may hold arbitrary Python objects,
    and this format is pickle-free): `SCPSolution.extras` and each
    IterationRecord's `extras`/`timing` dicts. Loaded records get empty
    dicts there."""
    state: Dict[str, Any] = {
        "status": int(sol.status),
        "algorithm": sol.algorithm,
        "iterations": int(sol.iterations),
        "xd": sol.xd, "ud": sol.ud, "p": sol.p,
        "cost": float(sol.cost),
        "t_grid": sol.t_grid,
        "feas": bool(sol.feas),
        "n_history": len(sol.history),
    }
    if sol.t_cont is not None:
        state["t_cont"] = sol.t_cont
        state["x_cont"] = sol.x_cont
    for i, rec in enumerate(sol.history):
        state[f"h{i}_x"] = rec.x
        state[f"h{i}_u"] = rec.u
        state[f"h{i}_p"] = rec.p
        state[f"h{i}_scalars"] = np.asarray([
            rec.iteration, rec.J_aug, rec.J_orig, float(rec.feas),
            rec.deviation, rec.improv_rel, rec.ipm_status, rec.ipm_iters,
            rec.defect_norm, rec.vd_norm, rec.vs_norm], dtype=np.float64)
    save_state(path, state)


def load_solution(path: str) -> SCPSolution:
    """Inverse of save_solution."""
    st = load_state(path)
    history = []
    for i in range(int(st["n_history"])):
        s = st[f"h{i}_scalars"]
        history.append(IterationRecord(
            iteration=int(s[0]), x=st[f"h{i}_x"], u=st[f"h{i}_u"],
            p=st[f"h{i}_p"], J_aug=float(s[1]), J_orig=float(s[2]),
            feas=bool(s[3]), deviation=float(s[4]), improv_rel=float(s[5]),
            ipm_status=int(s[6]), ipm_iters=int(s[7]),
            defect_norm=float(s[8]), vd_norm=float(s[9]),
            vs_norm=float(s[10])))
    return SCPSolution(
        status=SCPStatus(int(st["status"])),
        algorithm=st["algorithm"],
        iterations=int(st["iterations"]),
        xd=st["xd"], ud=st["ud"], p=st["p"],
        cost=float(st["cost"]), t_grid=st["t_grid"],
        feas=bool(st["feas"]), history=history,
        t_cont=st.get("t_cont"), x_cont=st.get("x_cont"))
