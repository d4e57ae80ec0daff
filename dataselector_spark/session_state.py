"""Driver-side session layer (SURVEY.md §2 A23/A24/A31) — deliberately NOT
Spark state.

The reference keeps per-(compound, axis-pair) stacks of view limits for
zoom-undo (`zoomHistory`, /root/reference/index.js:41, push logic
index.js:359-368, pop index.js:638-646, peek index.js:340-350) and a
count-based latch for tooltip persistence (`HoldToggle`,
index.js:902-926). Both are pure session/UI state: tiny, driver-local,
mutated per human gesture — putting them through Spark would add a job per
click for data that never exceeds a few hundred structs (SURVEY.md §1.5).

The Spark boundary: a peeked `Limits` feeds the A5 range filter
(`df.filter(col.between(lo, hi))`) and `zoom_window`
(operators/extents.py) validates a gesture against full extents computed by
one Spark agg. Everything else here is plain Python.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Hashable


@dataclass(frozen=True)
class Limits:
    """One axis-pair view window (the reference's {xMin,xMax,yMin,yMax}
    object, index.js:357). Values are data-space (epoch seconds / floats),
    compared by value exactly as areLimitsEqual does (index.js:373-380)."""

    x_min: float
    x_max: float
    y_min: float
    y_max: float


class ZoomHistory:
    """Per-(table, x-axis, y-axis) versioned-view stacks (A24).

    Reference semantics preserved:

    * `record` pushes only if the stack is empty or the top differs
      (index.js:359-368) — repeated re-renders at the same view never grow
      history;
    * `undo` pops the current view; the next `current` peek yields the
      previous one, or None when exhausted → caller falls back to full
      data-driven extents (index.js:638-646, 340-350);
    * stacks are independent per (table, x, y) triple — the reference
      pre-initializes the full cross product (index.js:695-705, A29); we
      create lazily, which is observationally identical.
    """

    def __init__(self) -> None:
        self._stacks: dict[tuple[Hashable, str, str], list[Limits]] = {}

    def _stack(self, table: Hashable, x: str, y: str) -> list[Limits]:
        return self._stacks.setdefault((table, x, y), [])

    def current(self, table: Hashable, x: str, y: str) -> Limits | None:
        stack = self._stack(table, x, y)
        return stack[-1] if stack else None

    def record(self, table: Hashable, x: str, y: str, limits: Limits) -> bool:
        """Push-if-changed; returns True if the view was actually recorded."""
        stack = self._stack(table, x, y)
        if stack and stack[-1] == limits:
            return False
        stack.append(limits)
        return True

    def undo(self, table: Hashable, x: str, y: str) -> Limits | None:
        """Pop the current view; return the restored (now-current) one."""
        stack = self._stack(table, x, y)
        if stack:
            stack.pop()
        return stack[-1] if stack else None

    def depth(self, table: Hashable, x: str, y: str) -> int:
        return len(self._stack(table, x, y))

    def reset(self) -> None:
        self._stacks.clear()


class HoldToggle:
    """Fire-on-Nth-trigger latch (A31, index.js:902-926): `trigger()`
    increments a counter and returns the flipped state exactly when the
    counter reaches `fire_on`, self-resetting with the flipped state as the
    new base — byte-for-byte the reference's tooltip-hold behavior."""

    def __init__(self, fire_on: int, start_state: bool = False) -> None:
        self.fire_on = fire_on
        self.start_state = start_state
        self.ct = 0

    def state(self) -> bool:
        resp = (not self.start_state) if self.ct == self.fire_on else self.start_state
        if resp is not self.start_state:
            self.reset(resp)
        return resp

    def trigger(self) -> bool:
        self.ct += 1
        return self.state()

    def reset(self, start_state: bool | None = None) -> None:
        if start_state is not None:
            self.start_state = start_state
        self.ct = 0
