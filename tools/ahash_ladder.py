"""Measured aHash image-dedup ladder: banded LSH join vs brute all-pairs
hamming scan as the corpus grows.

The b16_ahash_neardup claim is that the 8-bands-of-8-bits equi-join finds
EXACTLY the same pairs as an all-pairs scan (pigeonhole at hamming<=6) while
scaling like an equi-join: the shuffle carries 8 (id, band, value) rows of a
few bytes per image, and only band-colliding candidates pay the hamming
check — vs the all-pairs scan's O(n^2) comparisons. This ladder replicates
the paired corpus N times (pair structure preserved: replica i shifts both
ids by i*2*span) and measures both plans plus their pair-set equality.

Usage: python tools/ahash_ladder.py [max_replication]
(results recorded in docs/SCALE.md)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dataselector_spark.catalog import load_table  # noqa: E402
from dataselector_spark.multimodal import (  # noqa: E402
    ahash64,
    synthesize_bitmaps_paired,
)
from dataselector_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
THRESH = 6


def _hashes(spark, n):
    d = load_table(spark, SF, "documents").select("doc_id")
    span = 1_000_000
    reps = [
        d.select((F.col("doc_id") + F.lit(2 * i * span)).alias("doc_id"))
        for i in range(n)
    ]
    ids = reps[0]
    for r in reps[1:]:
        ids = ids.unionAll(r)
    return ahash64(synthesize_bitmaps_paired(ids))


def _ham(a_lo, b_lo, a_hi, b_hi):
    return (
        F.bit_count(a_lo.bitwiseXOR(b_lo)) + F.bit_count(a_hi.bitwiseXOR(b_hi))
    ).cast("int")


def _banded(hs):
    bands = hs.select(
        "doc_id",
        "ahash_lo",
        "ahash_hi",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftright(
                            F.col("ahash_lo" if i < 4 else "ahash_hi"),
                            8 * (i % 4),
                        )
                        .bitwiseAND(F.lit(255))
                        .alias("val"),
                    )
                    for i in range(8)
                ]
            )
        ).alias("b"),
    ).select("doc_id", "ahash_lo", "ahash_hi", "b.band", "b.val")
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            _ham(
                F.col("a.ahash_lo"),
                F.col("b.ahash_lo"),
                F.col("a.ahash_hi"),
                F.col("b.ahash_hi"),
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= THRESH)
        .distinct()
    )


def _brute(hs):
    a = hs.alias("a")
    b = hs.alias("b")
    return (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            _ham(
                F.col("a.ahash_lo"),
                F.col("b.ahash_lo"),
                F.col("a.ahash_hi"),
                F.col("b.ahash_hi"),
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= THRESH)
    )


def _wall(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    max_rep = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_spark("ahash-ladder", cpus=16, shuffle_partitions=16)
    n = 1
    while n <= max_rep:
        hs = _hashes(spark, n).localCheckpoint()  # hash build timed apart
        n_img = hs.count()
        banded, brute = _banded(hs), _brute(hs)
        _wall(banded)
        t_banded = _wall(banded)
        t_brute = _wall(brute)
        n_banded = banded.count()
        n_brute = brute.count()
        assert n_banded == n_brute, (n_banded, n_brute)  # exactness at scale
        print(
            f"rep={n:>2} images={n_img:>6,} pairs={n_banded:>6,} "
            f"banded={t_banded:6.2f}s brute={t_brute:7.2f}s "
            f"speedup={t_brute / t_banded:5.1f}x"
        )
        n *= 4


if __name__ == "__main__":
    main()
