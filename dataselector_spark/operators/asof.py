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
