"""Measured edit-distance ladder: plain vs threshold Levenshtein over the
blocked candidate join, at growing corpus replications.

b13_editdist_neardup generates candidate pairs with an equi-join on
(lang, 16-char length bucket) and pays Levenshtein only on candidates. The
pair count grows ~quadratically with docs-per-block, so the per-pair
distance cost dominates quickly — exactly where Spark's 3-arg threshold
form (banded DP, O(len*k) cells, abandons when a row minimum exceeds k)
should beat the full O(len^2) Wagner-Fischer, because almost every
candidate pair is far apart and abandons within a few rows.

For each replication factor the corpus is documents x N (doc_id offset per
copy so blocks grow but results stay deterministic); both variants run the
same join and filter to the same pair set (threshold returns the exact
distance inside the cutoff; -1 outside). Reports pair count, both walls
(median of 3 warm), and the ratio.

Usage: python tools/editdist_ladder.py [max_replication]
(r7 result at sf0.1, 1x: 100,499 pairs, plain 7.5 s vs threshold 1.53 s =
4.9x — recorded in docs/SCALE.md)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dataselector_spark.catalog import load_table
from dataselector_spark.session import get_spark

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
K = 12


def replicated(spark, n):
    d = load_table(spark, BASE, "documents").select("doc_id", "lang", "text")
    if n > 1:
        copies = spark.range(n).select(F.col("id").alias("copy"))
        d = d.crossJoin(F.broadcast(copies)).select(
            (F.col("doc_id") + F.col("copy") * 1_000_000).alias("doc_id"),
            "lang",
            # perturb each copy's text head so replicas aren't all
            # distance-0 pairs (that would measure the degenerate case)
            F.concat(
                F.substring(F.col("text"), 1, 1),
                F.lpad(F.col("copy").cast("string"), 2, "0"),
                F.col("text"),
            ).alias("text"),
        )
    return d.select(
        "doc_id",
        "lang",
        (F.length("text") / 16).cast("long").alias("len_bucket"),
        F.substring("text", 1, 64).alias("prefix"),
    )


def pairs(d):
    a, b = d.alias("a"), d.alias("b")
    return a.join(
        b,
        on=[
            F.col("a.lang") == F.col("b.lang"),
            F.col("a.len_bucket") == F.col("b.len_bucket"),
            F.col("a.doc_id") < F.col("b.doc_id"),
        ],
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
    spark = get_spark("editdist-ladder", cpus=32, shuffle_partitions=32)
    print(f"{'N':>3} {'pairs':>12} {'plain_s':>9} {'thresh_s':>9} {'ratio':>6}")
    n = 1
    while n <= max_n:
        d = replicated(spark, n)
        base = pairs(d)
        n_pairs = base.count()
        plain = base.select(
            F.levenshtein(F.col("a.prefix"), F.col("b.prefix")).alias("d")
        ).filter(F.col("d") <= K)
        thresh = base.select(
            F.levenshtein(F.col("a.prefix"), F.col("b.prefix"), K).alias("d")
        ).filter(F.col("d") >= 0)
        assert plain.count() == thresh.count()  # identical result set
        tp, tt = timed(plain), timed(thresh)
        print(f"{n:>3} {n_pairs:>12} {tp:>9.2f} {tt:>9.2f} {tp / tt:>6.2f}")
        n *= 2
    spark.stop()


if __name__ == "__main__":
    main()
