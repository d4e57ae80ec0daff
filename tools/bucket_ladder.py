"""Measured bucketed-join experiment: shuffled vs bucket-to-bucket join.

Replicates lineitem 10x (~6M rows) and joins it to orders twice with
broadcast DISABLED (the regime every fact-fact join lives in at 100 TB):

* plain parquet both sides  -> SortMergeJoin with BOTH sides exchanged;
* 8-bucket sorted tables    -> SortMergeJoin straight over bucketed scans,
  zero Exchange below the join (the layout b02_bucketed_join ships).

Prints wall seconds for each plus the one-time bucketed-write cost, so the
break-even is explicit: the write pass pays for itself after its cost /
(plain - bucketed) joins of the same shape. At warehouse scale the ratio is
far better than measured here because local[32] shuffles never touch a
network — every byte of a real cluster shuffle crosses racks.

Usage: python tools/bucket_ladder.py   (results recorded in docs/SCALE.md)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dataselector_spark.catalog import load_table
from dataselector_spark.session import get_spark

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROOT = "/tmp/dataselector_bucket_ladder"


def replicate(l, times):
    reps = None
    for i in range(times):
        r = l.withColumn("l_orderkey", F.col("l_orderkey"))
        # keep keys identical across replicas: amplifies rows-per-key, the
        # shape that makes the shuffle expensive, without changing the dim
        reps = r if reps is None else reps.unionByName(r)
    return reps


def run_join(o, l):
    t0 = time.perf_counter()
    (
        o.join(l, o["o_orderkey"] == l["l_orderkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("l_extendedprice").alias("rev"),
        )
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    return time.perf_counter() - t0


def main():
    spark = get_spark("bucket-ladder", cpus=32, shuffle_partitions=32)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    o = load_table(spark, BASE, "orders").select("o_orderkey", "o_orderpriority")
    l = replicate(
        load_table(spark, BASE, "lineitem").select("l_orderkey", "l_extendedprice"),
        10,
    )

    # one-time bucketed write (both sides)
    t0 = time.perf_counter()
    for name, df, key in (("orders", o, "o_orderkey"), ("lineitem", l, "l_orderkey")):
        tbl = f"ladder_bkt_{name}"
        (
            df.write.mode("overwrite")
            .format("parquet")
            .bucketBy(8, key)
            .sortBy(key)
            .option("path", os.path.join(ROOT, tbl))
            .saveAsTable(tbl)
        )
    write_s = time.perf_counter() - t0

    ob, lb = spark.table("ladder_bkt_orders"), spark.table("ladder_bkt_lineitem")

    # warm both paths once (file listing, codegen), then measure
    run_join(o, l), run_join(ob, lb)
    plain = min(run_join(o, l) for _ in range(3))
    bucketed = min(run_join(ob, lb) for _ in range(3))

    plan = (
        ob.join(lb, ob["o_orderkey"] == lb["l_orderkey"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan[:1500]

    print(
        f"rows={l.count()}  plain_join={plain:.2f}s  bucketed_join={bucketed:.2f}s  "
        f"speedup={plain / bucketed:.2f}x  one_time_bucketed_write={write_s:.2f}s  "
        f"write_pays_off_after={write_s / max(plain - bucketed, 1e-9):.1f} joins"
    )


if __name__ == "__main__":
    main()
