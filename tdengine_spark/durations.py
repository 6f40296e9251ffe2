"""TDengine duration literals → Spark interval strings / microseconds.

The reference grammar accepts duration literals with one-letter units
(parser: b=ns, u=us, a=ms, s, m, h, d, w, n=month, y). Calendar units
(n, y) are not fixed-width; they get date_trunc-based bucketing instead
of arithmetic (see operators/timewindow.py).
"""

from __future__ import annotations

import re

#: fixed-width units → microseconds
_US: dict[str, int] = {
    "b": 1 // 1000 or 0,  # ns: sub-microsecond, rounds to 0 — see parse note
    "u": 1,
    "a": 1_000,
    "s": 1_000_000,
    "m": 60 * 1_000_000,
    "h": 3_600 * 1_000_000,
    "d": 86_400 * 1_000_000,
    "w": 7 * 86_400 * 1_000_000,
}

CALENDAR_UNITS = ("n", "y", "q")

_DUR_RE = re.compile(r"^\s*(\d+)\s*([buasmhdwnyq])\s*$")


class Duration:
    """A parsed duration: either fixed-width (microseconds) or calendar."""

    def __init__(self, value: int, unit: str):
        if unit not in _US and unit not in CALENDAR_UNITS:
            raise ValueError(f"unknown duration unit {unit!r}")
        self.value = value
        self.unit = unit

    @property
    def is_calendar(self) -> bool:
        return self.unit in CALENDAR_UNITS

    @property
    def microseconds(self) -> int:
        if self.is_calendar:
            raise ValueError(f"calendar duration {self} has no fixed width")
        if self.unit == "b":
            if self.value % 1000:
                raise ValueError("ns precision below 1us not representable")
            return self.value // 1000
        return self.value * _US[self.unit]

    @property
    def seconds(self) -> float:
        return self.microseconds / 1_000_000

    @property
    def months(self) -> int:
        """Calendar width in months (n=1, q=3, y=12 per unit)."""
        if not self.is_calendar:
            raise ValueError(f"fixed duration {self} has no month width")
        return self.value * {"n": 1, "q": 3, "y": 12}[self.unit]

    def interval_string(self) -> str:
        """Spark interval literal (for F.window / INTERVAL exprs)."""
        if self.unit in ("n", "q"):
            return f"{self.months} months"
        if self.unit == "y":
            return f"{self.value} years"
        return f"{self.microseconds} microseconds"

    def __repr__(self) -> str:
        return f"Duration({self.value}{self.unit})"


def parse_duration(spec: "str | int | Duration") -> Duration:
    """Parse ``"10s"``, ``"500a"``, ``"1n"``, or a bare int (= milliseconds,
    matching the reference's default ms precision)."""
    if isinstance(spec, Duration):
        return spec
    if isinstance(spec, int):
        return Duration(spec, "a")
    m = _DUR_RE.match(spec)
    if not m:
        raise ValueError(f"bad duration literal {spec!r}")
    return Duration(int(m.group(1)), m.group(2))
