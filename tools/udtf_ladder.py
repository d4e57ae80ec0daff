"""Measured UDTF-vs-window tradeoff (r9): b21_udtf_partitioned's docstring
claims the imperative per-partition UDTF and the gaps-and-islands window
encoding are interchangeable with a measurable Python-boundary cost — this
tool measures it, at growing replications of the events table.

Both variants compute the identical per-user longest strictly-increasing
value streak (the suite entry's oracle-verified semantics); walls are
bench-method (noop sink, median of warm 3). Expectation going in: the
window form stays JVM-side (two window passes + two aggregates) and should
win; the UDTF pays Arrow serialization of every row into Python. The
point of recording it is the same as the reuse-vs-materialize pair in r8 —
per-plan measurement over dogma, and an honest number for the docstring's
"the loss is the Python boundary" claim.

Usage: python tools/udtf_ladder.py [max_replication]   (default 4)
Results recorded in docs/SCALE.md ("UDTF vs window").
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from dataselector_spark.catalog import load_table
from dataselector_spark.session import get_spark

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def replicated(spark, n):
    e = load_table(spark, BASE, "events").select(
        "user_id", "ts", "event_id", "value"
    )
    if n > 1:
        copies = spark.range(n).select(F.col("id").alias("copy"))
        e = e.crossJoin(F.broadcast(copies)).select(
            (F.col("user_id") + F.col("copy") * 1_000_000).alias("user_id"),
            "ts",
            (F.col("event_id") + F.col("copy") * 100_000_000).alias(
                "event_id"
            ),
            "value",
        )
    return e


def window_variant(e):
    ow = W.partitionBy("user_id").orderBy("ts", "event_id")
    brk = F.when(
        F.col("value") > F.lag("value").over(ow), F.lit(0)
    ).otherwise(F.lit(1))
    runs = e.select(
        "user_id",
        "ts",
        "event_id",
        brk.alias("brk"),
    ).select(
        "user_id",
        F.sum("brk")
        .over(ow.rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("run_id"),
    )
    runlen = runs.groupBy("user_id", "run_id").agg(
        F.count(F.lit(1)).alias("len")
    )
    return runlen.groupBy("user_id").agg(
        F.sum("len").alias("n_events"), F.max("len").alias("longest_streak")
    )


def udtf_variant(spark, e):
    from pyspark.sql.functions import udtf

    @udtf(returnType="user_id bigint, n_events bigint, longest_streak bigint")
    class Streak:
        def __init__(self):
            self.user = None
            self.n = 0
            self.cur = 0
            self.best = 0
            self.prev = None

        def eval(self, row):
            self.user = row.user_id
            self.n += 1
            if self.prev is not None and row.value > self.prev:
                self.cur += 1
            else:
                self.cur = 1
            self.best = max(self.best, self.cur)
            self.prev = row.value

        def terminate(self):
            if self.user is not None:
                yield (self.user, self.n, self.best)

    spark.udtf.register("ladder_streak", Streak)
    e.createOrReplaceTempView("ladder_events")
    return spark.sql(
        "SELECT * FROM ladder_streak(TABLE(ladder_events) "
        "PARTITION BY user_id ORDER BY (ts, event_id))"
    )


def timed(df, reps=3):
    runs = []
    for _ in range(reps):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        runs.append(time.perf_counter() - t0)
    return sorted(runs[1:])[0]


def main():
    max_n = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_spark("udtf-ladder", cpus=32, shuffle_partitions=32)
    print(f"{'N':>3} {'rows':>10} {'window_s':>9} {'udtf_s':>8} {'ratio':>6}")
    n = 1
    while n <= max_n:
        e = replicated(spark, n)
        rows = e.count()
        wv, uv = window_variant(e), udtf_variant(spark, e)
        # identical results before timing (sorted driver compare is fine at
        # these cardinalities: |users| rows)
        assert sorted(map(tuple, wv.collect())) == sorted(
            map(tuple, uv.collect())
        )
        tw, tu = timed(wv), timed(uv)
        print(
            f"{n:>3} {rows:>10} {tw:>9.2f} {tu:>8.2f} {tu / tw:>6.2f}",
            flush=True,
        )
        n *= 2
    spark.stop()


if __name__ == "__main__":
    main()
