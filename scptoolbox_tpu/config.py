"""Global status codes, errors, and dtype policy.

Mirrors the capability of the reference's src/utils/globals.jl:34-56
(`SCPStatus` enum and `SCPError`), redesigned for a JAX codebase: statuses are
also available as integer codes so they can live inside jitted state.
"""

from __future__ import annotations

import enum

import jax.numpy as jnp


class SCPStatus(enum.IntEnum):
    """Solver status. Integer-valued so it can be carried in device arrays.

    Capability parity with reference src/utils/globals.jl:34-42.
    """

    SOLVED = 0
    FAILED = 1
    SCALING_FAILED = 2
    GUESS_PROJECTION_FAILED = 3
    BAD_ARGUMENT = 4
    BAD_PROBLEM = 5

    def __str__(self) -> str:  # matches reference naming, e.g. "SCP_SOLVED"
        return f"SCP_{self.name}"


class SCPError(Exception):
    """Raised on SCP-level failures (reference src/utils/globals.jl:52-56)."""

    def __init__(self, status: SCPStatus, msg: str = ""):
        super().__init__(f"{status}: {msg}" if msg else str(status))
        self.status = status
        self.msg = msg


def default_dtype():
    """Working dtype: float64 when x64 is enabled (CPU tests), else float32.

    TPU hardware has no fast f64 path, so the production configuration is f32
    with iterative refinement inside the IPM; the CI/test configuration runs
    on CPU with x64 for tight oracles.
    """
    return jnp.zeros(0).dtype  # float64 under jax_enable_x64, float32 otherwise
