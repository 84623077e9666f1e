"""Converged-cost oracles (VERDICT/BASELINE: per-example converged cost
pinned within a relative gap so parity breaks fail CI).

Julia+ECOS is not available in this environment, so the pins are recorded
from this framework's own CPU/f64 runs (deterministic under the test
config) rather than transcribed from the reference solver. Two anchors
make them more than self-consistency checks: the double-integrator LCvx
cost is cross-validated against the analytic Pontryagin shooting solution
(test_lcvx), and every example's physical invariants (boundary conditions,
constraint satisfaction, losslessness) are asserted independently.

Record / refresh pins:  RECORD_COSTS=1 python -m pytest tests/ -q
"""

import json
import os
import pathlib

PATH = pathlib.Path(__file__).parent / "reference_costs.json"


def check_cost(name: str, value: float, rel: float = 1e-3) -> None:
    """Assert `value` matches the pinned converged cost for `name` within
    the pin's relative tolerance; with RECORD_COSTS=1, (re)record it."""
    value = float(value)
    data = json.loads(PATH.read_text()) if PATH.exists() else {}
    if os.environ.get("RECORD_COSTS"):
        data[name] = {"cost": value, "rel_tol": rel}
        PATH.write_text(json.dumps(data, indent=1, sort_keys=True) + "\n")
        return
    assert name in data, (
        f"no pinned cost for {name!r} in {PATH.name}; "
        "record with RECORD_COSTS=1")
    pin = data[name]
    tol = pin["rel_tol"] * max(abs(pin["cost"]), 1e-12)
    assert abs(value - pin["cost"]) <= tol, (
        f"{name}: converged cost {value} drifted from pinned "
        f"{pin['cost']} (rel_tol {pin['rel_tol']})")
