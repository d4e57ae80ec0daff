"""Window-vs-join law for negation-constrained funnels (SCALE.md r12).

b26_funnel_exclusion answers "A then B within T with no C between" with
ZERO joins: one user-partitioned ordered window (next-B / next-C
conditional mins), cost ~ one shuffle + per-user sort of the events.
The textbook formulation is a per-user time-range join (every A x every
B within T) followed by an interval anti-join against C — candidate
volume ~ sum_u A_u * B_u, i.e. QUADRATIC in per-user activity while the
window formulation stays linear.  This ladder measures both on a
synthetic fixture whose per-user activity grows while total events stay
fixed, isolating the law from corpus size.

Fixture: n_events total events over n_users users (activity = n_events /
n_users per user), event_type cycling click/purchase/error/view, 60 s
apart within a user.  Halving n_users doubles per-user activity: the
join's candidate volume quadruples per user but users halve -> net 2x,
wall follows; the window pass is flat.

Run: python tools/funnel_ladder.py
"""

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import Window as W  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from dataselector_spark.session import get_spark  # noqa: E402

WIN_US = 86_400_000_000


def fixture(spark, n_events, n_users):
    return (
        spark.range(n_events)
        .select(
            F.col("id").alias("event_id"),
            (F.col("id") % n_users).alias("user_id"),
            F.timestamp_micros(
                (F.col("id") / n_users).cast("bigint") * 60_000_000
            ).alias("ts"),
            F.element_at(
                F.array(
                    F.lit("click"), F.lit("purchase"),
                    F.lit("error"), F.lit("view"),
                ),
                (
                    ((F.col("id") * 1103515245 + 12345) / 65536)
                    .cast("bigint") % 4 + 1
                ).cast("int"),
            ).alias("event_type"),
        )
    )


def window_form(e, frame="desc_running"):
    if frame == "desc_running":
        # O(n)/partition: running conditional min in REVERSE time order —
        # Spark computes (UNBOUNDED PRECEDING, -1) frames as one
        # accumulating pass; "everything before me in desc order" ==
        # "everything after me in asc order".
        w = (
            W.partitionBy("user_id")
            .orderBy(F.col("ts").desc(), F.col("event_id").desc())
            .rowsBetween(W.unboundedPreceding, -1)
        )
    else:
        # O(n^2)/partition: Spark re-evaluates an UNBOUNDED FOLLOWING
        # frame by scanning from each row to the partition end.
        w = (
            W.partitionBy("user_id")
            .orderBy(F.col("ts").asc(), F.col("event_id").asc())
            .rowsBetween(1, W.unboundedFollowing)
        )
    o = e.select(
        "user_id", "ts", "event_id", "event_type",
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts")))
        .over(w).alias("np"),
        F.min(F.when(F.col("event_type") == "error", F.col("ts")))
        .over(w).alias("ne"),
    )
    st = (
        F.when(
            F.col("np").isNull()
            | (F.unix_micros("np") - F.unix_micros("ts") > F.lit(WIN_US)),
            F.lit("expired"),
        )
        .when(F.col("ne").isNotNull() & (F.col("ne") < F.col("np")),
              F.lit("blocked"))
        .otherwise(F.lit("converted"))
    )
    return (
        o.filter(F.col("event_type") == "click")
        .select(st.alias("s"))
        .groupBy("s").count()
    )


def join_form(e):
    a = e.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("ta"), F.col("event_id").alias("ia")
    )
    b = e.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("tb")
    )
    c = e.filter(F.col("event_type") == "error").select(
        "user_id", F.col("ts").alias("tc")
    )
    # first purchase after each click (range join + per-click min)
    ab = (
        a.join(b, "user_id")
        .filter(F.col("tb") > F.col("ta"))
        .groupBy("user_id", "ta", "ia")
        .agg(F.min("tb").alias("np"))
    )
    # interval anti-join against errors
    clean = ab.join(
        c,
        (ab["user_id"] == c["user_id"])
        & (F.col("tc") > F.col("ta"))
        & (F.col("tc") < F.col("np")),
        "left_anti",
    )
    return (
        a.join(clean.select("ia").withColumnRenamed("ia", "ic"),
               a["ia"] == F.col("ic"), "left")
        .join(ab.select(F.col("ia").alias("ib"), "np"),
              a["ia"] == F.col("ib"), "left")
        .select(
            F.when(
                F.col("np").isNull()
                | (F.unix_micros("np") - F.unix_micros("ta")
                   > F.lit(WIN_US)),
                F.lit("expired"),
            )
            .when(F.col("ic").isNull(), F.lit("blocked"))
            .otherwise(F.lit("converted"))
            .alias("s")
        )
        .groupBy("s").count()
    )


def wall(df, reps=3):
    best = None
    for _ in range(reps):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        best = dt if best is None or dt < best else best
    return best


def main():
    spark = get_spark("funnel-ladder", cpus=8, shuffle_partitions=8)
    n_events = 400_000
    print("n_events=400k fixed; rung = per-user activity")
    for n_users in (4000, 1000, 250, 62):
        e = fixture(spark, n_events, n_users).localCheckpoint()
        act = n_events // n_users
        wref = window_form(e)
        wnaive = window_form(e, frame="asc_unbounded_following")
        jref = join_form(e)
        # equivalence gate before timing
        wm = {r["s"]: r["count"] for r in wref.collect()}
        nm = {r["s"]: r["count"] for r in wnaive.collect()}
        jm = {r["s"]: r["count"] for r in jref.collect()}
        assert wm == jm == nm, (wm, jm, nm)
        tw = wall(window_form(e))
        tn = wall(window_form(e, frame="asc_unbounded_following"))
        tj = wall(join_form(e))
        print(
            f"activity={act:5d} users={n_users:5d} "
            f"desc_running={tw:6.2f}s naive_frame={tn:6.2f}s "
            f"join={tj:6.2f}s states={wm}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
