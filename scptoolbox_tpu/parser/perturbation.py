"""Per-element perturbation specification for the variational/KKT problem
(reference src/parser/perturbation.jl:22-111, consumed by
variation.jl:186-226, 484-494).

Each element of a variable block is tagged FREE (unbounded), FIXED
(delta = 0, or a pinned value), ABSOLUTE (|delta| <= amount), or RELATIVE
(|delta| <= amount * |nominal|). `Variation` posts the matching rows on
its delta-variables, replacing the least-norm-only selection with the
reference's bounded-perturbation semantics.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Optional, Sequence, Union

import numpy as np


class PerturbationKind(enum.Enum):
    """Reference perturbation.jl:22 `@enum(PerturbationKind, ...)`."""

    FREE = "free"
    FIXED = "fixed"
    ABSOLUTE = "absolute"
    RELATIVE = "relative"


FREE = PerturbationKind.FREE
FIXED = PerturbationKind.FIXED
ABSOLUTE = PerturbationKind.ABSOLUTE
RELATIVE = PerturbationKind.RELATIVE


@dataclasses.dataclass(frozen=True)
class Perturbation:
    """Per-element perturbation spec for one variable block (reference
    Perturbation ctor, perturbation.jl:50-89: kind/amount broadcast to the
    block shape; FREE forces amount=inf, FIXED defaults amount=0,
    ABSOLUTE/RELATIVE require an amount)."""

    kind: np.ndarray    # object array of PerturbationKind
    amount: np.ndarray  # float array, same shape

    @staticmethod
    def make(shape: Sequence[int],
             kind: Union[PerturbationKind, Sequence[PerturbationKind]],
             amount: Optional[Union[float, Sequence[float]]] = None
             ) -> "Perturbation":
        shape = tuple(int(s) for s in shape) or (1,)
        k = np.empty(shape, dtype=object)
        k[...] = kind if isinstance(kind, PerturbationKind) else None
        if not isinstance(kind, PerturbationKind):
            karr = np.asarray(kind, dtype=object)
            if karr.size == int(np.prod(shape)):
                # element-wise list for the whole block: reshape directly
                # (reference perturbation.jl:50-89 broadcasts kinds over
                # arbitrary block shapes, e.g. 6 kinds onto (2, 3))
                k = karr.reshape(shape).copy()
            else:
                k = np.broadcast_to(karr, shape).copy()
        a = np.full(shape, np.nan, dtype=float)
        if amount is not None:
            a[...] = np.broadcast_to(np.asarray(amount, float), shape)
        flat_k = k.reshape(-1)
        flat_a = a.reshape(-1)
        for i in range(flat_k.size):
            ki = flat_k[i]
            if ki == PerturbationKind.FREE:
                flat_a[i] = np.inf
            elif ki == PerturbationKind.FIXED:
                if np.isnan(flat_a[i]):
                    flat_a[i] = 0.0
            elif np.isnan(flat_a[i]):
                raise ValueError(
                    f"Perturbation is {ki} but amount was not specified "
                    "(perturbation.jl:80-84)")
        return Perturbation(kind=k, amount=a)


def perturbation(shape, kind, amount=None) -> Perturbation:
    """Convenience ctor mirroring the reference's `@perturb_*` macros
    (block.jl:445-487)."""
    return Perturbation.make(shape, kind, amount)
