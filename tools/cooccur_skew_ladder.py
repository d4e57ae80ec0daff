"""Measured hot-cell fan-out curve for the co-occurrence edge build
(operators/graph.py — VERDICT r9 "Next round" #2).

The edge build self-joins the (event_type, bucket, user_id) cell
membership on the cell key: a cell of c users contributes c*(c-1)/2
pairs, so the JOIN work of one flash-crowd cell grows quadratically
while its input share grows linearly.  This ladder plants a single hot
cell of increasing size on top of a fixed uniform background and times
the full edge build (distinct pair count, noop-style terminal count),
recording the measured wall next to the cell's pair fan-out — the curve
SCALE.md cites and the number the sampled probe (graph.warn_hot_cells)
exists to catch before the join runs.

Run: python tools/cooccur_skew_ladder.py [hot_sizes...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from dataselector_spark.operators.graph import (  # noqa: E402
    cooccurrence_pairs,
)
from dataselector_spark.session import get_spark  # noqa: E402

BACKGROUND_CELLS = 2000
BACKGROUND_USERS_PER_CELL = 10  # 20k background rows, 45 pairs/cell


def planted_cells(spark, hot_size: int):
    bg = spark.range(BACKGROUND_CELLS * BACKGROUND_USERS_PER_CELL).select(
        F.lit("view").alias("event_type"),
        (F.col("id") % BACKGROUND_CELLS).cast("bigint").alias("bucket"),
        # distinct users per cell: id encodes (cell, slot)
        F.col("id").alias("user_id"),
    )
    hot = spark.range(hot_size).select(
        F.lit("flash").alias("event_type"),
        F.lit(999_999).cast("bigint").alias("bucket"),
        F.col("id").alias("user_id"),
    )
    return bg.unionByName(hot)


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [0, 100, 1000, 3000, 10000]
    spark = get_spark("cooccur-skew-ladder", cpus=8, shuffle_partitions=8)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    print(
        f"background: {BACKGROUND_CELLS} cells x {BACKGROUND_USERS_PER_CELL}"
        f" users = {BACKGROUND_CELLS * BACKGROUND_USERS_PER_CELL} rows,"
        f" {BACKGROUND_CELLS * 45} pairs"
    )
    for hot in sizes:
        cells = planted_cells(spark, hot).localCheckpoint()
        fanout = hot * (hot - 1) // 2
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            n = (
                cooccurrence_pairs(cells, skew_warn_frac=None)
                .distinct()
                .count()
            )
            walls.append(time.perf_counter() - t0)
        w = sorted(walls)[1]
        share = hot / (hot + BACKGROUND_CELLS * BACKGROUND_USERS_PER_CELL)
        print(
            f"hot={hot:>6} rows ({100 * share:5.1f}% of input) "
            f"fanout={fanout:>12,} pairs edges={n:>12,} wall={w:7.3f}s"
        )
    spark.stop()


if __name__ == "__main__":
    main()
