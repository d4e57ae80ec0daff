"""Measured interval-join experiment: shuffled bucketed-time join vs the
write-once COLOCATED layout (b04_interval_join_colocated).

Replicates events Nx (default 10x, ~1M points at sf0.1) and runs the same
key-less interval join (signup windows of 1 hour) three ways with broadcast
DISABLED (the regime a fact-fact interval probe lives in at 100 TB):

* naive          -> raw range-predicate join (broadcast-nested-loop /
                    cartesian). Only run at small replication — quadratic.
* bucketed       -> explode intervals into hour buckets, equi-join on the
                    bucket (interval_join_bucketed): one shuffle per side,
                    per probe.
* colocated      -> both sides WRITTEN ONCE as 8-bucket sorted tables on the
                    bucket key, then merge-joined with zero Exchange below
                    the join (the layout b04_interval_join_colocated ships).

Prints wall seconds for each plus the one-time bucketed-write cost, so the
break-even is explicit: the write pass pays for itself after
write_cost / (bucketed - colocated) probes of the same shape. On a real
cluster the ratio improves further — local[32] shuffles never cross a
network.

Usage: python tools/interval_ladder.py [replication]
(results recorded in docs/SCALE.md)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dataselector_spark.catalog import load_table
from dataselector_spark.operators.rangejoin import (
    interval_join_bucketed,
    with_time_buckets,
)
from dataselector_spark.session import get_spark

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROOT = "/tmp/dataselector_interval_ladder"


def agg_and_run(joined):
    t0 = time.perf_counter()
    (
        joined.groupBy("iv_id")
        .agg(F.count(F.lit(1)).alias("n_points"))
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    return time.perf_counter() - t0


def main():
    times = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark()
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    e = load_table(spark, BASE, "events")
    points = e.select(
        F.col("event_id").alias("point_id"), F.col("ts").alias("pts")
    )
    reps = points
    for i in range(1, times):
        reps = reps.unionByName(
            points.withColumn("point_id", F.col("point_id") + F.lit(i * 10**9))
        )
    reps = reps.localCheckpoint()  # pin the replicated input out of lineage
    intervals = e.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("iv_id"),
        F.col("ts").alias("start"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("end"),
    ).localCheckpoint()
    n_p, n_iv = reps.count(), intervals.count()
    print(f"points={n_p} intervals={n_iv} (replication {times}x)")

    # --- bucketed (shuffle per probe) ------------------------------------
    joined = interval_join_bucketed(
        reps, intervals, "pts", "start", "end", bucket_seconds=3600,
        skew_warn_frac=None,
    )
    warm = [agg_and_run(joined) for _ in range(3)]
    print(f"bucketed (shuffle per probe): {sorted(warm)[1]:.2f}s  {warm}")

    # --- colocated (write once, zero-shuffle probes) ---------------------
    t0 = time.perf_counter()
    pb = reps.withColumn(
        "__bucket", (F.unix_timestamp("pts") / 3600).cast("long")
    )
    ib = with_time_buckets(intervals, F.col("start"), F.col("end"), 3600)
    for df, t in ((pb, "ladder_points"), (ib, "ladder_intervals")):
        (
            df.write.mode("overwrite")
            .format("parquet")
            .bucketBy(8, "__bucket")
            .sortBy("__bucket")
            .option("path", os.path.join(ROOT, t))
            .saveAsTable(t)
        )
    write_cost = time.perf_counter() - t0
    p, iv = spark.table("ladder_points"), spark.table("ladder_intervals")
    joined = p.join(iv.hint("merge"), "__bucket").filter(
        (F.col("pts") >= F.col("start")) & (F.col("pts") < F.col("end"))
    )
    warm2 = [agg_and_run(joined) for _ in range(3)]
    med_b, med_c = sorted(warm)[1], sorted(warm2)[1]
    print(f"colocated (zero-shuffle probe): {med_c:.2f}s  {warm2}")
    print(f"one-time bucketed write: {write_cost:.2f}s")
    if med_b > med_c:
        print(
            f"speedup {med_b / med_c:.2f}x; write pays for itself after "
            f"{write_cost / (med_b - med_c):.1f} probes"
        )


if __name__ == "__main__":
    main()
