"""Two-hop expansion law for link prediction (SCALE.md r11).

b26_link_prediction's candidate generation is the directed two-hop
self-join: it materializes sum_v deg(v)^2 intermediate rows.  A single hub
vertex therefore owns a QUADRATIC share of the stage while owning a linear
share of the edges — the same degenerate law as the cell self-join
(tools/cooccur_skew_ladder.py), one hop later.  This ladder measures it and
the standard remedy (cap hub degree before expanding).

Fixture: a background graph of `n_bg` vertices with uniform degree ~d, plus
one planted hub adjacent to `hub_deg` vertices.  We count two-hop candidate
rows and wall-clock with and without a degree cap at the 99th percentile.

Run: python tools/linkpred_ladder.py
"""

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from dataselector_spark.session import get_spark  # noqa: E402


def edges_for(spark, n_bg=2000, d=8, hub_deg=0):
    """Directed edge list: background ring-of-d graph + optional hub 0."""
    bg = (
        spark.range(n_bg)
        .select(F.col("id").alias("src"), F.explode(
            F.array(*[F.lit(k) for k in range(1, d + 1)])).alias("k"))
        .select("src", ((F.col("src") + F.col("k")) % n_bg).alias("dst"))
    )
    und = bg.union(bg.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    if hub_deg:
        spokes = spark.range(1, hub_deg + 1).select(
            F.lit(10_000_000).alias("src"), F.col("id").alias("dst")
        )
        und = und.union(spokes).union(
            spokes.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    return und.distinct().localCheckpoint()


def two_hop_stage(ed, cap=None, mode="drop"):
    """The ENTRY's real candidate stage: two-hop expansion INTO the
    (a, b) aggregation shuffle (a bare count() underprices it ~70x —
    measured: the 50M-row expansion counts in 1.2 s but shuffles in 82 s).
    Executed via toRdd().count() so no driver collect inflates it.

    cap modes: "drop" removes hub VERTICES above the cap (the r11 rung);
    "truncate" keeps every vertex but clips its adjacency to the cap
    lowest-id neighbors — the deterministic machinery
    b26_link_prediction_capped executes and oracle-replays (r12)."""
    if cap is not None and mode == "drop":
        deg = ed.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
        keep = deg.filter(F.col("deg") <= cap).select("src")
        ed = (
            ed.join(F.broadcast(keep), "src")
            .join(
                F.broadcast(keep.select(F.col("src").alias("dst"))), "dst"
            )
        )
    elif cap is not None and mode == "truncate":
        from pyspark.sql import Window

        rnw = Window.partitionBy("src").orderBy("dst")
        ed = (
            ed.withColumn("rn", F.row_number().over(rnw))
            .filter(F.col("rn") <= cap)
            .select("src", "dst")
            .localCheckpoint()
        )
    e1 = ed.select(F.col("src").alias("a"), F.col("dst").alias("mid"))
    e2 = ed.select(F.col("src").alias("mid"), F.col("dst").alias("b"))
    t0 = time.perf_counter()
    n = (
        e1.join(e2, "mid")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("common"))
        ._jdf.queryExecution()
        .toRdd()
        .count()
    )
    return n, time.perf_counter() - t0


def main():
    spark = get_spark("linkpred-ladder", cpus=8, shuffle_partitions=8)
    print("config | edges | candidate_groups | wall_med3_s")
    for hub, cap, mode in (
        (0, None, "drop"),
        (2000, None, "drop"),
        (2000, 32, "drop"),
        (2000, 32, "truncate"),
        (10000, None, "drop"),
        (10000, 32, "drop"),
        (10000, 32, "truncate"),
    ):
        ed = edges_for(spark, hub_deg=hub)
        n_edges = ed.count()
        runs = sorted(two_hop_stage(ed, cap, mode) for _ in range(3))
        n, wall = runs[0][0], runs[1][1]
        label = "uncapped" if cap is None else f"cap=p99({cap}),{mode}"
        print(f"hub_deg={hub:5d} {label} | {n_edges} | {n} | {wall:.2f}")


if __name__ == "__main__":
    main()
