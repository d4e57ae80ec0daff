"""Interval / range joins — SURVEY.md §2 B4.

Two shapes:

* `interval_join_keyed` — range condition WITH an equi-key (the common
  telemetry shape: "events of the same user within Δt"). Spark already
  executes this as an equi-join on the key with the range as a post-filter —
  a single hash shuffle; fine at scale. We keep it declarative.

* `interval_join_bucketed` — PURE range condition (no equi-key). Naively this
  is a broadcast-nested-loop (cartesian × filter) — quadratic, dead at 100 TB.
  The scale path buckets the time axis: explode each interval into the fixed-
  width buckets it overlaps, equi-join on bucket, then apply the exact range
  predicate and de-dup. Turns O(n·m) into O(pairs that could match), with the
  bucket width trading shuffle fan-out vs candidate-pair count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interval_join_keyed(
    left: DataFrame,
    right: DataFrame,
    key: str,
    cond: Column,
    how: str = "inner",
) -> DataFrame:
    """Equi-join on ``key`` + arbitrary range predicate ``cond``. Catalyst
    plans the shuffle on the key; ``cond`` stays a post-join filter."""
    return left.join(right, (left[key] == right[key]) & cond, how)


def with_time_buckets(
    df: DataFrame,
    start: Column,
    end: Column,
    bucket_seconds: int,
    out: str = "__bucket",
) -> DataFrame:
    """Explode each [start, end) interval into every ``bucket_seconds``-wide
    epoch bucket it overlaps (the equi-join key for bucketed range joins)."""
    lo = (F.unix_timestamp(start) / bucket_seconds).cast("long")
    hi = (F.unix_timestamp(end) / bucket_seconds).cast("long")
    return df.withColumn(out, F.explode(F.sequence(lo, hi)))


def interval_join_bucketed(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start: str,
    end: str,
    bucket_seconds: int = 86400,
) -> DataFrame:
    """Join point rows to interval rows with start <= ts < end, no equi-key:
    bucket both sides on the time axis, equi-join on bucket, exact-filter.
    Output columns = points ++ intervals (caller projects)."""
    p = points.withColumn(
        "__bucket", (F.unix_timestamp(F.col(point_ts)) / bucket_seconds).cast("long")
    )
    iv = with_time_buckets(intervals, F.col(start), F.col(end), bucket_seconds)
    joined = p.join(iv, "__bucket").filter(
        (F.col(point_ts) >= F.col(start)) & (F.col(point_ts) < F.col(end))
    )
    return joined.drop("__bucket")
