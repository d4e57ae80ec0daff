"""Measured small-file ladder: the same table scanned at growing file
counts, before and after compact_small_files.

b22_compaction_readback's claim is that per-file overhead (footer read,
task setup, no row-group pruning across tiny files) dominates scan time
long before data size does. This writes the sf events table (plus an Nx
replication) as 1 file-per-partition fragments at several granularities,
times a filter+aggregate scan over each, then compacts to the byte-target
layout and times the same scan.

Usage: python tools/compaction_ladder.py [replication]
(results recorded in docs/SCALE.md)
"""

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dataselector_spark.catalog import load_table
from dataselector_spark.operators.layout import compact_small_files
from dataselector_spark.session import get_spark

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROOT = "/tmp/dataselector_compaction_ladder"


def timed(df, reps=3):
    runs = []
    for _ in range(reps):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        runs.append(time.perf_counter() - t0)
    return sorted(runs[1:])[0]


def scan(spark, path):
    df = spark.read.parquet(path)
    return df.filter(F.col("value") > 50).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum("value").alias("s")
    )


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark("compaction-ladder", cpus=32, shuffle_partitions=32)
    e = load_table(spark, BASE, "events")
    if n > 1:
        copies = spark.range(n).select(F.col("id").alias("copy"))
        e = e.crossJoin(F.broadcast(copies)).select(
            (F.col("event_id") + F.col("copy") * 100_000_000).alias("event_id"),
            "ts", "user_id", "event_type", "value",
        )
    shutil.rmtree(ROOT, ignore_errors=True)
    print(f"{'files':>6} {'scan_s':>7}")
    for n_files in (8, 64, 512, 2048):
        frag = os.path.join(ROOT, f"frag{n_files}")
        e.repartition(n_files).write.mode("overwrite").parquet(frag)
        real = len([f for f in os.listdir(frag) if f.endswith(".parquet")])
        print(f"{real:>6} {timed(scan(spark, frag)):>7.3f}")
    packed = os.path.join(ROOT, "packed")
    n_out = compact_small_files(
        spark, os.path.join(ROOT, "frag2048"), packed,
        target_file_bytes=64 * 1024 * 1024, order_by=["event_id"],
    )
    print(f"compacted 2048 -> {n_out}: scan {timed(scan(spark, packed)):.3f}s")
    spark.stop()


if __name__ == "__main__":
    main()
