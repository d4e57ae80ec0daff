"""Measured iteration-scaling for b26_pagerank_fixedpoint (r9): does a
per-iteration localCheckpoint() pay for itself?

Two shapes, both measured (sf0.1, local[8], 417k edges; edge build
checkpointed once in ALL variants so the ladder isolates the
iteration-lineage effect):

1. SINGLE TERMINAL ACTION (the suite entry's shape — one plan, one
   execution at the end). Measured: lazy WINS at every rung through 12
   iterations (e.g. 12 iters: lazy 2.17 s vs checkpointed 3.27 s; 6
   iters: 1.29 vs 1.61). Why: the chain is linear, and each groupBy's
   shuffle already materializes its map outputs — every iteration
   executes exactly once even lazily; per-iteration checkpoints only add
   a materialization pass. The docstring claim this tool originally set
   out to verify ("without checkpoint, iteration k re-executes 1..k-1")
   is FALSE for this shape — recorded as a negative result, and the
   suite entry now deliberately does NOT checkpoint ranks.

2. ACTION PER ITERATION (a convergence probe — how real PageRank runs:
   iterate until |r_k - r_{k-1}| < eps). Measured (probe =
   sum(rank).collect() each iteration):

       iters  checkpointed  lazy
         2        2.11 s    1.63 s
         4        1.98      3.22
         6        2.17      4.63
         8        3.03      7.44

   Lazy grows quadratically — each probe is a NEW query execution that
   re-runs the full prefix (DataFrame actions build fresh physical
   plans; shuffle reuse does not span separate executions). Checkpointed
   stays ~flat per iteration. Crossover at ~3 iterations.

THE RULE: checkpoint per iteration iff each iteration runs its own
action; a lazy chain into one action needs no truncation. Same
per-plan-measurement-over-dogma discipline as the r8
reuse-vs-materialize pair (triangle count vs prefix-filter).

Usage: python tools/pagerank_ladder.py [max_iters] [--probe]
(default 6; --probe measures shape 2). Results recorded in
docs/SCALE.md ("PageRank iteration lineage").
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dataselector_spark.catalog import load_table
from dataselector_spark.session import get_spark

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCALE = 1_000_000


def build_edges(spark):
    ev = load_table(spark, BASE, "events")
    g = ev.select(
        "event_type",
        F.floor(F.col("ts").cast("long") / 600).cast("bigint").alias("bucket"),
        "user_id",
    ).distinct()
    und = (
        g.alias("a")
        .join(
            g.alias("b"),
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.user_id") < F.col("b.user_id")),
        )
        .select(F.col("a.user_id").alias("ua"), F.col("b.user_id").alias("ub"))
        .distinct()
    )
    return (
        und.select("ua", "ub")
        .union(und.select(F.col("ub").alias("ua"), F.col("ua").alias("ub")))
        .localCheckpoint()
    )


def pagerank(edges, iters, checkpoint_each, probe=False):
    deg = edges.groupBy("ua").agg(F.count(F.lit(1)).alias("deg"))
    ranks = deg.select(
        F.col("ua").alias("u"), F.lit(SCALE).cast("bigint").alias("rank")
    )
    for _ in range(iters):
        contrib = (
            edges.join(ranks, edges.ua == ranks.u)
            .join(deg.withColumnRenamed("ua", "du"), F.col("du") == F.col("u"))
            .select(
                F.col("ub").alias("u2"),
                F.expr("(rank * 85) DIV (100 * deg)").alias("c"),
            )
        )
        ranks = (
            contrib.groupBy("u2")
            .agg(F.sum("c").alias("s"))
            .select(
                F.col("u2").alias("u"),
                (F.lit(150_000).cast("bigint") + F.col("s")).alias("rank"),
            )
        )
        if checkpoint_each:
            ranks = ranks.localCheckpoint()
        if probe:
            ranks.agg(F.sum("rank")).collect()
    return ranks


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    probe = "--probe" in sys.argv
    max_iters = int(args[0]) if args else 6
    spark = get_spark("pagerank-ladder", cpus=8, shuffle_partitions=8)
    edges = build_edges(spark)
    edges.count()  # warm
    shape = "action-per-iteration (probe)" if probe else "single action"
    print(f"edges={edges.count()}  base={BASE}  shape={shape}")
    print(f"{'iters':>5} {'checkpointed_s':>14} {'lazy_lineage_s':>14}")
    for it in range(1, max_iters + 1):
        walls = []
        for ck in (True, False):
            t0 = time.perf_counter()
            r = pagerank(edges, it, ck, probe=probe)
            r._jdf.queryExecution().toRdd().count()
            walls.append(time.perf_counter() - t0)
        print(f"{it:>5} {walls[0]:>14.2f} {walls[1]:>14.2f}")
    spark.stop()


if __name__ == "__main__":
    main()
