"""As-of join (nearest-earlier match per key) — SURVEY.md §2 B5.

Spark has no native ASOF JOIN. The naive encoding (theta-join on
``l.ts >= r.ts`` + row_number) materializes every (left, earlier-right) pair
before pruning — quadratic per key, hopeless at 100 TB. This implementation
uses the merge-asof pattern instead:

    union both sides into one stream tagged left/right
    -> single hash shuffle on the key
    -> per-key sort by (ts, side)
    -> ``last(struct(right_payload), ignorenulls=True)`` over rows
       UNBOUNDED PRECEDING, unpacked after

The payload travels as ONE struct column so the entire matched right row is
attached atomically — NULLs inside the nearest row stay NULL instead of
being back-filled per-column from older rows (pandas/DuckDB ASOF semantics).

One shuffle, one sort, linear output — the same work a groupBy would do.
Right rows sort before left rows at equal timestamps, giving the standard
``l.ts >= r.ts`` (inclusive) semantics of DuckDB/pandas ``merge_asof``.

Skew note: a hot key degrades to one big sorted partition; pre-salt by a
coarse time bucket (carrying the previous bucket's closing state) if a single
key exceeds executor memory. Not needed at driver scales.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_payload: list[str] | None = None,
    suffix: str = "_asof",
    tolerance=None,
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_ts <= left_ts`` within the same ``on`` key (left-outer: nulls when
    no earlier right row exists).

    ``right_payload`` — right columns to carry (default: all but key/ts),
    emitted as ``<col><suffix>``.

    ``tolerance`` — optional maximum allowed ``left_ts - right_ts`` (a Column
    expression or literal in the ts columns' own difference algebra, e.g.
    ``F.expr("INTERVAL 30 MINUTES")`` for timestamps or an integer for
    numeric ts). Matches farther back than the tolerance are nulled —
    pandas ``merge_asof(tolerance=...)`` semantics, the attribution-window
    form ("latest click within 30 minutes of the purchase"). Applied as a
    post-filter on the matched timestamp, so the plan is unchanged: one
    shuffle, one sort.
    """
    if right_payload is None:
        right_payload = [c for c in right.columns if c not in (on, right_ts)]

    # Tag and union. side=0 (right) sorts before side=1 (left) at equal ts so
    # an exactly-simultaneous right row is visible to the left row (>= join).
    # The payload is packed into ONE struct: last(struct, ignorenulls=True)
    # attaches the whole nearest-earlier row atomically, so a NULL inside the
    # matched row is preserved rather than filled from an older right row.
    r = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.struct(
            F.col(right_ts).alias("__match_ts"),
            *[F.col(c) for c in right_payload],
        ).alias("__p"),
    )
    l = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__p"].dataType).alias("__p"),
        *[F.col(c) for c in left.columns],
    )
    # Align schemas: right side carries nulls for left columns.
    r_full = r.select(
        "__k",
        "__ts",
        "__side",
        "__p",
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns],
    )
    unioned = r_full.unionByName(l.select("__k", "__ts", "__side", "__p", *left.columns))

    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *left.columns,
        F.col("__side").alias("__side"),
        F.last("__p", ignorenulls=True).over(w).alias("__p"),
    )
    matched = filled.filter(F.col("__side") == 1)
    if tolerance is not None:
        tol = tolerance if isinstance(tolerance, Column) else F.lit(tolerance)
        in_window = (
            F.col("__p").isNotNull()
            & ((F.col(left_ts) - F.col("__p").getField("__match_ts")) <= tol)
        )
        matched = matched.withColumn(
            "__p", F.when(in_window, F.col("__p"))
        )
    return matched.select(
        *left.columns,
        *[
            F.col("__p").getField(c).alias(f"{c}{suffix}")
            for c in right_payload
        ],
    )


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_payload: list[str] | None = None,
    suffix: str = "_asof",
    tolerance=None,
) -> DataFrame:
    """pandas ``merge_asof(direction='nearest')``: for each left row, attach
    the right row (same ``on`` key) whose timestamp is CLOSEST in either
    direction; equal distance breaks to the earlier (backward) row.

    Same merge-asof plan as `asof_join` — one union, ONE hash shuffle on the
    key, one per-key sort — with TWO window frames over that single sort:
    ``last(payload) ignorenulls`` over UNBOUNDED PRECEDING..CURRENT (the
    backward candidate) and the same running ``last`` in REVERSE time
    order (the forward candidate — identical semantics to first() over
    CURRENT..UNBOUNDED FOLLOWING, but a running frame instead of the
    O(n^2)-per-key shrinking frame; see the inline note), then a row-local
    CASE picks the closer. An exactly-simultaneous right row sorts BEFORE
    the left row, so it is the backward candidate at distance 0 — which
    always wins — making the forward frame's blindness to equal timestamps
    harmless.

    Determinism: right rows are deduplicated to one row per (key, ts) first
    (greatest ``dedup_tiebreak`` tuple wins — REQUIRED for a stable survivor;
    defaults to the payload columns), mirroring what an engine-native ASOF
    leaves unspecified under timestamp ties.

    ``tolerance``: maximum allowed |left_ts - right_ts| (Column or literal
    in the ts difference algebra); farther matches are nulled, both
    directions.
    """
    if right_payload is None:
        right_payload = [c for c in right.columns if c not in (on, right_ts)]

    from .dedup import dedup_exact

    right = dedup_exact(
        right, [on, right_ts], [F.col(c).desc() for c in right_payload]
    )

    r = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.struct(
            F.col(right_ts).alias("__match_ts"),
            *[F.col(c) for c in right_payload],
        ).alias("__p"),
    )
    l = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__p"].dataType).alias("__p"),
        *[F.col(c) for c in left.columns],
    )
    r_full = r.select(
        "__k",
        "__ts",
        "__side",
        "__p",
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns],
    )
    unioned = r_full.unionByName(l.select("__k", "__ts", "__side", "__p", *left.columns))

    order = [F.col("__ts").asc(), F.col("__side").asc()]
    w_back = (
        Window.partitionBy("__k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # The forward candidate is a RUNNING last() in REVERSE time order, NOT
    # first() over (CURRENT ROW, UNBOUNDED FOLLOWING): Spark evaluates a
    # running (UNBOUNDED PRECEDING..CURRENT) frame in one accumulating pass
    # per partition, but re-scans any UNBOUNDED FOLLOWING frame from every
    # row to the partition end — O(n^2) per join key (measured: 0.94 s ->
    # 13.99 s for first() as rows/partition grow 400 -> 6451 on a fixed
    # 400k-row input, while this formulation holds 0.22 s flat with
    # identical values; see docs/SCALE.md, the r12 window-frame law).
    # Semantics are unchanged: under (__ts DESC, __side DESC) a frame
    # ending at the current left row contains exactly the rows with
    # ts' > ts — an equal-timestamp right row (side 0) sorts AFTER the
    # left row (side 1) in this order, preserving the forward frame's
    # documented blindness to simultaneous rows.
    w_fwd = (
        Window.partitionBy("__k")
        .orderBy(F.col("__ts").desc(), F.col("__side").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *left.columns,
        F.col(left_ts).alias("__lts"),
        F.col("__side"),
        F.last("__p", ignorenulls=True).over(w_back).alias("__b"),
        F.last("__p", ignorenulls=True).over(w_fwd).alias("__f"),
    ).filter(F.col("__side") == 1)

    # Distance algebra: exact micros for timestamps, plain subtraction for
    # numeric ts — both engine-exact longs/doubles, no float rounding.
    is_ts = str(left.schema[left_ts].dataType).startswith("Timestamp")

    def dist(a: Column, b: Column) -> Column:
        if is_ts:
            return F.unix_micros(a) - F.unix_micros(b)
        return a - b

    b_ts = F.col("__b").getField("__match_ts")
    f_ts = F.col("__f").getField("__match_ts")
    d_b = dist(F.col("__lts"), b_ts)
    d_f = dist(f_ts, F.col("__lts"))
    winner = (
        F.when(F.col("__b").isNull(), F.col("__f"))
        .when(F.col("__f").isNull(), F.col("__b"))
        .when(d_f < d_b, F.col("__f"))  # strict: ties fall back(ward)
        .otherwise(F.col("__b"))
    )
    picked = filled.withColumn("__p", winner)
    if tolerance is not None:
        tol = tolerance if isinstance(tolerance, Column) else F.lit(tolerance)
        w_ts = F.col("__p").getField("__match_ts")
        gap = F.when(w_ts <= F.col("__lts"), F.col("__lts") - w_ts).otherwise(
            w_ts - F.col("__lts")
        )
        picked = picked.withColumn(
            "__p", F.when(F.col("__p").isNotNull() & (gap <= tol), F.col("__p"))
        )
    return picked.select(
        *left.columns,
        *[F.col("__p").getField(c).alias(f"{c}{suffix}") for c in right_payload],
    )
