"""Measured exact-distinct ladder: bitmap aggregates vs count(DISTINCT)
vs approx_count_distinct as ROW count grows with cardinality held fixed.

The b06_bitmap_distinct claim is that the bitmap path's shuffle is bounded
by (scopes x populated buckets x 4KB) REGARDLESS of row count — the
many-rows-per-id regime (events, clickstreams) where exact
count(DISTINCT)'s expand-shuffle carries every (scope, id) pair. This
ladder replicates the events table N times WITHOUT changing user_ids, so
rows scale N-fold and distinct counts stay constant, then measures the
per-event_type distinct walls:

* bitmap -> bitmap_construct_agg per (type, bucket) + bitmap_count sum
            (shuffle rows flat in N: map-side OR absorbs replicas)
* exact  -> groupBy(type).agg(countDistinct(user_id))
            (Spark plans distinct via Expand: shuffle ~ rows pre-dedup,
            partially combined map-side to distinct (type,id) pairs)
* approx -> approx_count_distinct (HLL++, bounded but NOT exact)

All three return the same per-type answer at every rung (bitmap == exact
asserted; approx within its rsd) — the ladder is about the walls.

Usage: python tools/bitmap_ladder.py [max_replication]
(results recorded in docs/SCALE.md)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dataselector_spark.catalog import load_table  # noqa: E402
from dataselector_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _replicate(e, n):
    """n copies with IDENTICAL ids: rows scale n-x, distincts stay flat."""
    out = e
    for _ in range(n - 1):
        out = out.unionAll(e)
    return out


def _replicate_wide(e, n):
    """n copies with DISJOINT dense id ranges: rows AND distincts scale
    n-x. Here exact count(DISTINCT)'s shuffle carries O(distinct)
    (type,id) pairs while the bitmap path's carries
    O(distinct/32768) <=4KB cells — the bounded-state regime."""
    span = 100_000
    reps = [
        e.select(
            "event_type",
            (F.col("user_id") + F.lit(i * span)).alias("user_id"),
        )
        for i in range(n)
    ]
    out = reps[0]
    for r in reps[1:]:
        out = out.unionAll(r)
    return out


def _bitmap(e):
    return (
        e.select(
            "event_type",
            F.expr("bitmap_bucket_number(user_id)").alias("bkt"),
            F.expr("bitmap_bit_position(user_id)").alias("pos"),
        )
        .groupBy("event_type", "bkt")
        .agg(F.expr("bitmap_construct_agg(pos)").alias("bm"))
        .groupBy("event_type")
        .agg(F.sum(F.expr("bitmap_count(bm)")).alias("n"))
    )


def _exact(e):
    return e.groupBy("event_type").agg(F.countDistinct("user_id").alias("n"))


def _approx(e):
    return e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id").alias("n")
    )


def main() -> None:
    max_n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    spark = get_spark(cpus=8, shuffle_partitions=16)
    base = load_table(spark, SF, "events").select("event_type", "user_id")
    for mode, rep in (("flat-card", _replicate), ("grow-card",
                                                  _replicate_wide)):
        n = 1
        while n <= max_n:
            e = rep(base, n).localCheckpoint()  # isolate input cost
            rows = e.count()
            walls = {}
            results = {}
            for name, fn in (("bitmap", _bitmap), ("exact", _exact),
                             ("approx", _approx)):
                t0 = time.monotonic()
                results[name] = {
                    r["event_type"]: r["n"] for r in fn(e).collect()
                }
                walls[name] = round(time.monotonic() - t0, 3)
            assert results["bitmap"] == results["exact"], (
                results["bitmap"], results["exact"])
            print(
                f"{mode} x{n}: rows={rows} bitmap={walls['bitmap']}s "
                f"exact={walls['exact']}s approx={walls['approx']}s "
                f"(bitmap==exact verified)",
                flush=True,
            )
            n *= 4
    spark.stop()


if __name__ == "__main__":
    main()
