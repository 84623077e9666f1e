"""Scalar optimization by golden-section search.

Capability parity with reference src/utils/helper.jl `golden` (:291-331),
used by the LCvx rocket-landing example to minimize cost over flight time
(rocket_landing/tests.jl:33). Host-side loop by design: each probe typically
launches a full jitted conic solve.
"""

from __future__ import annotations

import math
from typing import Callable, Tuple

_INVPHI = (math.sqrt(5.0) - 1.0) / 2.0  # 1/phi
_INVPHI2 = (3.0 - math.sqrt(5.0)) / 2.0  # 1/phi^2


def golden(
    f: Callable[[float], float],
    a: float,
    b: float,
    tol: float = 1e-3,
) -> Tuple[float, float]:
    """Minimize unimodal f on [a, b] to interval tolerance `tol`.

    Returns (x_best, f(x_best)). Approximately log_phi((b-a)/tol) function
    evaluations (reference helper.jl:291-331).
    """
    a, b = float(a), float(b)
    h = b - a
    if h <= tol:
        x = (a + b) / 2.0
        return x, f(x)

    n = int(math.ceil(math.log(tol / h) / math.log(_INVPHI)))
    c = a + _INVPHI2 * h
    d = a + _INVPHI * h
    yc = f(c)
    yd = f(d)
    for _ in range(n - 1):
        if yc < yd:
            b, d, yd = d, c, yc
            h *= _INVPHI
            c = a + _INVPHI2 * h
            yc = f(c)
        else:
            a, c, yc = c, d, yd
            h *= _INVPHI
            d = a + _INVPHI * h
            yd = f(d)
    if yc < yd:
        x = (a + d) / 2.0
    else:
        x = (c + b) / 2.0
    y = f(x)
    # return the best of everything probed
    if yc < y:
        x, y = c, yc
    if yd < y:
        x, y = d, yd
    return x, y
