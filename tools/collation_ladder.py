"""Measured cost of collated grouping (UTF8_LCASE) vs the lower() rewrite,
backing b11_collated_group's SortAggregate scale note.

Collated grouping keys currently have no hash-aggregate support, so the
plan is SortAggregate (sort-based, two local sorts around the exchange);
the lower() rewrite hash-aggregates. This ladder prices that difference
at growing replications of the events table — the number SCALE.md's
"a real cost to budget" phrase owes the reader. Both variants compute
identical results (asserted before timing).

Bench method: noop-sink execution via the df's own QueryExecution,
median of 3 warm runs after one discarded first-touch.

Usage: python tools/collation_ladder.py [max_replication]   (default 8)
Results recorded in docs/SCALE.md ("Collation ladder").
"""

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dataselector_spark.catalog import load_table
from dataselector_spark.session import get_spark

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def replicated(spark, n, card=1):
    """card > 1 appends a modular suffix so the key space grows to
    ~5*card distinct values — the dimension that separates hash from
    sort aggregation (at 5 keys, map-side partial agg collapses
    everything before any sort can matter)."""
    e = load_table(spark, BASE, "events").select("event_id", "event_type")
    if n > 1:
        copies = spark.range(n).select(F.col("id").alias("copy"))
        e = e.crossJoin(F.broadcast(copies)).select(
            (F.col("event_id") + F.col("copy") * 100_000_000).alias(
                "event_id"
            ),
            "event_type",
        )
    base = F.when(F.col("event_id") % 3 == 0, F.upper("event_type")).when(
        F.col("event_id") % 3 == 1, F.lower("event_type")
    ).otherwise(F.col("event_type"))
    if card > 1:
        base = F.concat(
            base, F.lit("_"), (F.col("event_id") % card).cast("string")
        )
    return e.select(
        base.alias("k_raw"), (F.col("event_id") % 1000).alias("v")
    )


def collated(src):
    return src.groupBy(
        F.expr("k_raw COLLATE UTF8_LCASE").alias("k_ci")
    ).agg(
        F.min("k_raw").alias("k_min"),
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("v_sum"),
    ).drop("k_ci")


def lowered(src):
    return src.groupBy(F.lower("k_raw").alias("k_lo")).agg(
        F.min("k_raw").alias("k_min"),
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("v_sum"),
    ).drop("k_lo")


def bench(df, reps=4):
    walls = []
    for _ in range(reps):
        t0 = time.perf_counter()
        df._jdf.queryExecution().toRdd().count()
        walls.append(time.perf_counter() - t0)
    return statistics.median(walls[1:])


def main():
    max_n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    spark = get_spark("collation-ladder", cpus=8, shuffle_partitions=8)
    # equality check once at x1 (sorted row sets)
    src = replicated(spark, 1)
    a = {tuple(r) for r in collated(src).collect()}
    b = {tuple(r) for r in lowered(src).collect()}
    assert a == b, "variants disagree"
    print(f"{'xN':>3} {'card':>8} {'rows':>10} {'collated_s':>10} {'lower_s':>8} {'ratio':>6}")
    n = 1
    while n <= max_n:
        src = replicated(spark, n)
        rows = src.count()
        c = bench(collated(src))
        l = bench(lowered(src))
        print(f"{n:>3} {5:>8} {rows:>10} {c:>10.2f} {l:>8.2f} {c / l:>6.2f}")
        n *= 2
    # cardinality dimension at fixed x4: grow the distinct-key count
    for card in (1_000, 100_000, 1_000_000):
        src = replicated(spark, 4, card=card)
        rows = src.count()
        c = bench(collated(src))
        l = bench(lowered(src))
        print(
            f"{4:>3} {card * 5:>8} {rows:>10} {c:>10.2f} {l:>8.2f}"
            f" {c / l:>6.2f}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
