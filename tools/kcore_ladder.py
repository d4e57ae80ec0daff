"""Measured materialization policy for b26_kcore (r9): lazy edge chain
vs per-round localCheckpoint.

Unlike PageRank's rank chain (ONE consumer per step — measured lazy-wins
in tools/pagerank_ladder.py), each k-core round consumes e_r FOUR times
(two UNION ALL endpoint scans for degrees + two left-semi probes), so
the lazy logical tree replicates the expensive co-occurrence self-join
4^rounds times. AQE's exchange reuse dedups *identical* exchanges at
runtime, so the question needs a measurement, not dogma — this tool
records it. Run: python tools/kcore_ladder.py [sf_dir] [rounds...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from dataselector_spark.catalog import load_table  # noqa: E402
from dataselector_spark.session import get_spark  # noqa: E402


def build_edges(spark, sf_dir):
    g = (
        load_table(spark, sf_dir, "events")
        .select(
            "event_type",
            F.floor(F.col("ts").cast("long") / 60).cast("bigint").alias("bucket"),
            "user_id",
        )
        .distinct()
    )
    return (
        g.alias("a")
        .join(
            g.alias("b"),
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.user_id") < F.col("b.user_id")),
        )
        .select(F.col("a.user_id").alias("ua"), F.col("b.user_id").alias("ub"))
        .distinct()
        .localCheckpoint()  # both variants share a materialized base
    )


def peel(e, rounds, checkpoint):
    for _ in range(rounds):
        deg = (
            e.select(F.col("ua").alias("v"))
            .unionByName(e.select(F.col("ub").alias("v")))
            .groupBy("v")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        keep = deg.filter(F.col("deg") >= 2).select("v")
        e = (
            e.join(keep.withColumnRenamed("v", "ua"), "ua", "left_semi")
            .join(keep.withColumnRenamed("v", "ub"), "ub", "left_semi")
            .select("ua", "ub")
        )
        if checkpoint:
            e = e.localCheckpoint()
    return (
        e.select(F.col("ua").alias("user_id"))
        .unionByName(e.select(F.col("ub").alias("user_id")))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("core_degree"))
    )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rungs = [int(a) for a in sys.argv[2:]] or [1, 2, 3, 4, 6]
    spark = get_spark("kcore-ladder", cpus=8, shuffle_partitions=8)
    for rounds in rungs:
        for label, cp in (("checkpointed", True), ("lazy", False)):
            t0 = time.time()
            e = build_edges(spark, sf_dir)
            out = peel(e, rounds, cp)
            n = out._jdf.queryExecution().toRdd().count()
            wall = time.time() - t0
            plan = out._jdf.queryExecution().executedPlan().toString()
            print(
                f"rounds={rounds:2d} {label:13s} wall={wall:6.2f}s "
                f"vertices={n:5d} plan_exchanges={plan.count('Exchange ')}",
                flush=True,
            )


if __name__ == "__main__":
    main()

# NOTE (r9 measurement): the lazy variant is not merely slower — at
# rounds >= 4 the 4^rounds logical-tree replication blows up CATALYST
# (analysis/optimization time), not execution; see the recorded rungs in
# docs/SCALE.md. Run lazy rungs with a timeout.
