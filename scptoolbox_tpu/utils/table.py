"""Fixed-width iteration progress table (host-side observability).

Capability parity with reference src/utils/table.jl (:26-221): column-defined
fixed-width REPL table, headed sections, per-row printing from a dict, header
reprint after reset, and `improvement_percent` formatting.
"""

from __future__ import annotations

import math
from typing import Callable, Dict, List, Optional, Sequence


class Column:
    """One table column: dict key, heading, printf-style format, width."""

    def __init__(self, key: str, heading: str, fmt: str, width: Optional[int] = None):
        self.key = key
        self.heading = heading
        # accept "{:12.4e}" (str.format), "%12.4e" (printf), or "12.4e" (spec)
        if fmt.startswith("{:") and fmt.endswith("}"):
            fmt = fmt[2:-1]
        self.fmt = fmt
        self.width = max(width or 0, len(heading) + 2)


class Table:
    """Progress table printed one row per SCP iteration.

    (reference table.jl:26-76 definition; :170-192 row printing)
    """

    def __init__(self, columns: Sequence[Column], print_fn: Callable[[str], None] = print):
        self.columns = list(columns)
        self._print = print_fn
        self._header_printed = False

    def reset(self):
        """Force the header to print again before the next row (table.jl:160)."""
        self._header_printed = False

    def _header(self) -> str:
        cells = [c.heading.rjust(c.width) for c in self.columns]
        line = " |".join(cells)
        rule = "-" * len(line)
        return line + "\n" + rule

    def print_row(self, row: Dict):
        """Print one row; missing keys render blank (table.jl:170-192)."""
        if not self._header_printed:
            self._print(self._header())
            self._header_printed = True
        cells: List[str] = []
        for c in self.columns:
            if c.key in row and row[c.key] is not None:
                try:
                    cell = (c.fmt % row[c.key]) if "%" in c.fmt else format(row[c.key], c.fmt)
                except (TypeError, ValueError):
                    cell = str(row[c.key])
            else:
                cell = ""
            cells.append(cell.rjust(c.width))
        self._print(" |".join(cells))


def improvement_percent(J_old: float, J_new: float) -> float:
    """Relative cost improvement in percent (reference table.jl:206-221)."""
    if not math.isfinite(J_old) or J_old == 0.0:
        return float("nan")
    return (J_old - J_new) / abs(J_old) * 100.0
