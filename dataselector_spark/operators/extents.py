"""Extent aggregation + axis-domain math (reference A7-A12, A23).

`processAxis` (/root/reference/index.js:277-317) computes min/max over the
active column, snaps numeric domains outward to a step (index.js:301-305) and
builds an affine data->pixel map (index.js:291-293, 308-310) with an inverse
for zoom gestures (index.js:225-228). The aggregation is a one-row Spark agg;
the affine/inverse maps are pure expression builders so box predicates stay
expressible in data space (A6 == A5 after inversion).

`zoom_window` reproduces the zoom clamp/floor semantics (index.js:230-240):
out-of-bounds -> reset to full extent; window narrower than `min_window` ->
expand to a centered minimum window. Driver-side scalar math on the one-row
extents result — no distributed work.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.cleaning import round_down_to_step, round_up_to_step


def extents(df: DataFrame, *cols: str) -> DataFrame:
    """One-row min/max per column (index.js:281-285, 299-305), aliased
    `<col>_min` / `<col>_max`."""
    aggs = []
    for c in cols:
        aggs.append(F.min(c).alias(f"{c}_min"))
        aggs.append(F.max(c).alias(f"{c}_max"))
    return df.agg(*aggs)


def snapped_extents(df: DataFrame, col: str, step: float) -> DataFrame:
    """Numeric extents snapped outward to a step multiple (index.js:301-305)."""
    return df.agg(
        round_down_to_step(F.min(col), step).alias(f"{col}_min"),
        round_up_to_step(F.max(col), step).alias(f"{col}_max"),
    )


def affine_map(col: Column, dlo: float, dhi: float, rlo: float, rhi: float) -> Column:
    """scaleLinear().domain([dlo,dhi]).range([rlo,rhi]) as arithmetic
    (index.js:308-310)."""
    return (col - F.lit(dlo)) / F.lit(dhi - dlo) * F.lit(rhi - rlo) + F.lit(rlo)


def affine_invert(col: Column, dlo: float, dhi: float, rlo: float, rhi: float) -> Column:
    """scale.invert(px) (index.js:225-228)."""
    return (col - F.lit(rlo)) / F.lit(rhi - rlo) * F.lit(dhi - dlo) + F.lit(dlo)


@dataclass(frozen=True)
class Window1D:
    lo: float
    hi: float


def zoom_window(
    lo: float, hi: float, full: Window1D, min_window: float
) -> Window1D:
    """Zoom clamp & floor (index.js:230-240)."""
    if lo < full.lo or hi > full.hi or lo >= hi:
        return full
    if hi - lo < min_window:
        center = (lo + hi) / 2
        lo = max(full.lo, center - min_window / 2)
        hi = min(full.hi, lo + min_window)
        lo = max(full.lo, hi - min_window)
    return Window1D(lo, hi)


def _tick_increment(start: float, stop: float, count: int) -> float:
    """d3-array tickIncrement semantics (public d3 algorithm): the tick step
    for a [start, stop] domain at ~count ticks, returned as a positive
    integer step or a NEGATIVE reciprocal for fractional steps (so the
    caller can stay in exact integer arithmetic either way)."""
    e10, e5, e2 = 50 ** 0.5, 10 ** 0.5, 2 ** 0.5
    step = (stop - start) / max(0, count)
    power = math.floor(math.log10(step))
    error = step / 10 ** power
    factor = 10 if error >= e10 else 5 if error >= e5 else 2 if error >= e2 else 1
    if power >= 0:
        return factor * 10 ** power
    return -(10 ** -power) / factor


def nice_domain(lo: float, hi: float, count: int = 10) -> Window1D:
    """A10: d3 `scale.nice()` (index.js:310 — the reference nices every
    linear y-scale with the default tick count): expand the domain outward
    to tick-aligned bounds, iterating until the step stabilizes, exactly as
    d3-scale does."""
    if lo > hi:
        lo, hi = hi, lo
    if lo == hi:
        return Window1D(lo, hi)
    prestep = None
    for _ in range(10):
        step = _tick_increment(lo, hi, count)
        if step == prestep:
            break
        if step > 0:
            lo = math.floor(lo / step) * step
            hi = math.ceil(hi / step) * step
        elif step < 0:
            lo = math.ceil(lo * step) / step
            hi = math.floor(hi * step) / step
        else:
            break
        prestep = step
    return Window1D(lo, hi)
