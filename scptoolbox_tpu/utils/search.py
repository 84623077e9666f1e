"""Scalar optimization by golden-section search.

Behavioral parity with reference src/utils/helper.jl `golden` (:291-331),
used by the LCvx rocket-landing example to minimize cost over flight time
(rocket_landing/tests.jl:33). Host-side loop by design: each probe typically
launches a full jitted conic solve.

The reference's bracketing rule is deliberately NONSTANDARD: on rejection it
swaps `a, b = b, c` (reversing the interval and keeping the incumbent `d`)
instead of the textbook monotone shrink. For objectives that are +inf outside
an interior feasible window — exactly the rocket-landing cost, where both
initial probes of the canonical bracket are infeasible — the oscillating
bracket re-enters and converges into the window, while the textbook variant
discards it. We reproduce that semantic and additionally return the best of
ALL probed points (a strict improvement; the reference returns f(b)).
"""

from __future__ import annotations

import math
from typing import Callable, Tuple

_PHI = (1.0 + math.sqrt(5.0)) / 2.0


def golden(
    f: Callable[[float], float],
    a: float,
    b: float,
    tol: float = 1e-3,
) -> Tuple[float, float]:
    """Minimize f on [a, b] to bracket tolerance `tol`.

    Returns (x_best, f(x_best)) over all probed points. Performs
    ceil(log_phi((b-a)/tol) + 1) + 1 function evaluations
    (reference helper.jl:291-331).
    """
    a, b = float(a), float(b)
    if abs(b - a) <= tol:
        x = 0.5 * (a + b)
        return x, f(x)

    n = int(math.ceil(math.log((b - a) / tol) / math.log(_PHI) + 1.0))
    rho = _PHI - 1.0
    best_x, best_y = math.nan, math.inf

    def probe(x):
        nonlocal best_x, best_y
        y = f(x)
        if y < best_y or math.isnan(best_x):
            best_x, best_y = x, y
        return y

    d = rho * b + (1.0 - rho) * a
    yd = probe(d)
    for _ in range(n - 1):
        c = rho * a + (1.0 - rho) * b
        yc = probe(c)
        if yc < yd:
            b, d, yd = d, c, yc
        else:
            a, b = b, c

    y_final = probe(b)
    if y_final <= best_y:
        return b, y_final
    return best_x, best_y
