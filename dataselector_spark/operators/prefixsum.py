"""Distributed prefix (running) sums over a global ordering.

A naive ``sum(...) OVER (ORDER BY k)`` window plans a SinglePartition sort —
every row through ONE task, the classic scale cliff for CDFs / cumulative
metrics over high-cardinality keys. This operator is the textbook two-level
encoding:

    1. range-partition on the order key (sampled balanced boundaries)
    2. per-partition running sums (local window, parallel)
    3. per-partition totals -> running OFFSETS over the tiny totals relation
       (one window over num_partitions rows)
    4. broadcast-join offsets back and add

Wall cost: one range exchange + one local sort — the same work a distributed
ORDER BY does — instead of a serial global window. Results are identical to
the single-partition form for ANY partition boundaries (prefix sums over a
total order don't depend on where the cuts land), which keeps oracle checks
stable.

LAYOUT-FORK HAZARD (r13, found rebuilding b06_equidepth_histogram on this
operator): the totals branch and the pass-through branch both read the
range exchange, and correctness requires them to see the SAME partition
layout — guaranteed in one query by Catalyst exchange reuse. Do NOT
localCheckpoint an intermediate between them: the checkpoint runs as its
own job, AQE re-coalesces the forked execution independently, and
spark_partition_id diverges between branches (observed: 11-bucket ntile
garbage). Callers composing on top of running_sums inherit the same rule;
pin ReusedExchange in a plan test when it matters (tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def running_sums(
    df: DataFrame,
    order_by: list[str],
    sum_cols: list[str],
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``cum_<c>`` columns: the running sum of each ``sum_cols`` entry
    over the global ``order_by`` ordering (ties contribute in order — give a
    total order for deterministic results). All other columns pass through."""
    parts = (
        df.repartitionByRange(num_partitions, *order_by)
        if num_partitions
        else df.repartitionByRange(*order_by)
    )
    parts = parts.withColumn("__pid", F.spark_partition_id())
    w_local = (
        Window.partitionBy("__pid")
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c in sum_cols:
        parts = parts.withColumn(f"__local_{c}", F.sum(c).over(w_local))

    totals = parts.groupBy("__pid").agg(
        *[F.sum(c).alias(f"__tot_{c}") for c in sum_cols]
    )
    # Running offsets over the tiny per-partition totals relation: this
    # window IS single-partition, but over num_partitions rows, not data.
    w_off = (
        Window.orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = totals.select(
        "__pid",
        *[
            (F.sum(f"__tot_{c}").over(w_off) - F.col(f"__tot_{c}")).alias(f"__off_{c}")
            for c in sum_cols
        ],
    )
    out = parts.join(F.broadcast(offsets), "__pid")
    for c in sum_cols:
        out = out.withColumn(f"cum_{c}", F.col(f"__local_{c}") + F.col(f"__off_{c}"))
    drop = ["__pid"] + [f"__local_{c}" for c in sum_cols] + [f"__off_{c}" for c in sum_cols]
    return out.drop(*drop)
