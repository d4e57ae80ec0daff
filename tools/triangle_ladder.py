"""Measured triangle-counting ladder: naive ordered enumeration vs
degree-ordered orientation, at growing graph replications.

b26_triangle_count orients every edge from its (degree, id)-smaller to its
larger endpoint and generates wedges only among oriented out-neighbors —
the Suri & Vassilvitskii construction whose out-degrees are bounded
O(sqrt(E)) whatever the raw degree skew. The naive alternative (the
oracle's shape) enumerates wedges at EVERY vertex over its full neighbor
list ordered by id, so a hub vertex with degree d contributes d²/2 wedge
candidates — the "last reducer" that dominates the stage.

Each rung replicates the sf0.1 user co-occurrence graph with disjoint user
ranges (block-diagonal copies: organic triangles scale linearly, per-vertex
degrees stay constant) and adds 8 HUB users adjacent to EVERY vertex, with
hub ids at the MEDIAN of the id space — the skew case the orientation
exists for. Two findings the first draft got wrong, kept honest here:
(a) the id-ordered a<b<c join is itself an orientation, just one
uncorrelated with degree — on the hub-free organic graph it is within
1.1x of degree-ordering (measured, rep=1: 19.7M vs 17.8M wedges); (b) its
hub cost is POSITION-DEPENDENT: a hub at the id extremes contributes ~0
middle-vertex wedges, while a mid-range id pays indeg*outdeg ~ d^2/4 —
you cannot pick ids to dodge this, because the hub you do not know about
yet will sit wherever it sits. Degree-ordering is robust regardless of
position: hubs become sinks and pay 0 wedges, at the price of ~|hubs|*|E|
extra out-edges spread over all vertices (linear, balanced). The hubs'
naive wedge term grows ~n^2 against the organic ~n, so the gap widens
with replication. Reports wedge volumes (the shuffle the two strategies
pay), per-strategy walls (median of 3 warm), and asserts triangle totals
equal at every rung.

Usage: python tools/triangle_ladder.py [max_replication]
(r8 result at sf0.1 + 8 median-id hubs, triangle totals asserted equal:
 rep=1 218k edges 5.5M tri: wedges 24.5M vs 19.0M (1.3x), wall 1.20x
 rep=2 441k edges 11.2M tri: wedges 60.4M vs 38.5M (1.6x), wall 1.61x
 rep=4 882k edges 22.4M tri: wedges 157M vs 77.1M (2.0x), wall 2.31x
— the naive hub term grows ~n^2 vs the oriented ~n; recorded in
docs/SCALE.md)
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


def base_edges(spark):
    ev = load_table(spark, BASE, "events")
    g = ev.select(
        "event_type",
        F.floor(F.col("ts").cast("long") / 600).cast("bigint").alias("bucket"),
        "user_id",
    ).distinct()
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
    )


N_HUBS = 8


def replicated_with_hub(spark, e, n):
    """Block-diagonal copies plus N_HUBS hubs adjacent to EVERY vertex.

    Hub ids sit at the MEDIAN of the replicated id space (between the two
    middle copies; mid-range for n=1), so under the id-ordered naive join
    each hub has a balanced in/out split — indeg*outdeg ~ degree^2/4
    middle-vertex wedges, the worst position for an orientation
    uncorrelated with degree."""
    copies = spark.range(n).select(F.col("id").alias("copy"))
    blocks = e.crossJoin(F.broadcast(copies)).select(
        (F.col("ua") + F.col("copy") * 1_000_000).alias("ua"),
        (F.col("ub") + F.col("copy") * 1_000_000).alias("ub"),
    )
    verts = (
        blocks.select(F.col("ua").alias("v"))
        .unionAll(blocks.select(F.col("ub").alias("v")))
        .distinct()
    )
    hub_base = 750 if n == 1 else (n // 2) * 1_000_000 - 100
    hubs = spark.range(N_HUBS).select((hub_base - F.col("id")).alias("hu"))
    hub_edges = (
        F.broadcast(hubs)
        .crossJoin(verts)
        .select(
            F.least("hu", "v").alias("ua"), F.greatest("hu", "v").alias("ub")
        )
    )
    hub_pairs = (
        hubs.alias("h1")
        .crossJoin(hubs.alias("h2"))
        .filter(F.col("h1.hu") < F.col("h2.hu"))
        .select(F.col("h1.hu").alias("ua"), F.col("h2.hu").alias("ub"))
    )
    return (
        blocks.unionAll(hub_edges)
        .unionAll(hub_pairs)
        .filter(F.col("ua") != F.col("ub"))  # n=1 hub ids reuse organic ids
        .distinct()  # hub edges can duplicate organic edges
        .repartition(32)
        .localCheckpoint()
    )


def naive_triangles(e):
    """Oracle shape: id-ordered three-way self-join (e already has ua<ub)."""
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    wedges = e1.join(e2, F.col("e2.ua") == F.col("e1.ub")).select(
        F.col("e1.ua").alias("a"),
        F.col("e1.ub").alias("b"),
        F.col("e2.ub").alias("c"),
    )
    return wedges.join(
        e3, (F.col("e3.ua") == F.col("a")) & (F.col("e3.ub") == F.col("c"))
    ).select("a", "b", "c")


def naive_wedge_count(e):
    """Row volume of naive_triangles' first join (wedges through the
    middle vertex under id-ordering): each hub pays C(hub_degree, 2) here
    because its negative id makes it the source of every incident edge."""
    e1, e2 = e.alias("e1"), e.alias("e2")
    return e1.join(e2, F.col("e2.ua") == F.col("e1.ub")).count()


def oriented(e):
    deg = (
        e.select(F.col("ua").alias("u"))
        .unionAll(e.select(F.col("ub").alias("u")))
        .groupBy("u")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    da = deg.select(F.col("u").alias("ua"), F.col("degree").alias("dega"))
    db = deg.select(F.col("u").alias("ub"), F.col("degree").alias("degb"))
    ek = e.join(da, "ua").join(db, "ub")
    a_first = (F.col("dega") < F.col("degb")) | (
        (F.col("dega") == F.col("degb")) & (F.col("ua") < F.col("ub"))
    )
    return ek.select(
        F.when(a_first, F.col("ua")).otherwise(F.col("ub")).alias("src"),
        F.when(a_first, F.col("ub")).otherwise(F.col("ua")).alias("dst"),
        F.when(a_first, F.col("degb")).otherwise(F.col("dega")).alias("dst_deg"),
    )


def oriented_wedges(o):
    o1, o2 = o.alias("o1"), o.alias("o2")
    return o1.join(
        o2,
        (F.col("o1.src") == F.col("o2.src"))
        & (
            (F.col("o1.dst_deg") < F.col("o2.dst_deg"))
            | (
                (F.col("o1.dst_deg") == F.col("o2.dst_deg"))
                & (F.col("o1.dst") < F.col("o2.dst"))
            )
        ),
    ).select(
        F.col("o1.src").alias("x"),
        F.col("o1.dst").alias("y"),
        F.col("o2.dst").alias("z"),
    )


def oriented_triangles(e):
    o = oriented(e)
    closing = o.select(F.col("src").alias("y"), F.col("dst").alias("z"))
    return oriented_wedges(o).join(closing, ["y", "z"]).select("x", "y", "z")


def wall(fn, reps=3):
    walls = []
    for _ in range(reps):
        t = time.time()
        fn()
        walls.append(time.time() - t)
    return statistics.median(walls)


def main():
    max_rep = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_spark("triangle-ladder", cpus=32, shuffle_partitions=32)
    base = base_edges(spark)
    rep = 1
    while rep <= max_rep:
        e = replicated_with_hub(spark, base, rep)
        n_tri_naive = naive_triangles(e).count()
        n_tri_orient = oriented_triangles(e).count()
        assert n_tri_naive == n_tri_orient, (n_tri_naive, n_tri_orient)
        w_naive_wedges = naive_wedge_count(e)
        w_orient_wedges = oriented_wedges(oriented(e)).count()
        t_naive = wall(lambda: naive_triangles(e).count())
        t_orient = wall(lambda: oriented_triangles(e).count())
        print(
            f"rep={rep} edges={e.count()} triangles={n_tri_naive} "
            f"wedges naive={w_naive_wedges} oriented={w_orient_wedges} "
            f"({w_naive_wedges / max(w_orient_wedges, 1):.1f}x fewer) "
            f"wall naive={t_naive:.2f}s oriented={t_orient:.2f}s "
            f"({t_naive / t_orient:.2f}x)",
            flush=True,
        )
        rep *= 2
    spark.stop()


if __name__ == "__main__":
    main()
