"""Measured image-dedup ladder: banded LSH join vs brute all-pairs hamming
scan as the corpus grows, at BOTH fingerprint widths.

Two claims, one honest finding each (recorded in docs/SCALE.md):
* ahash64 (8 bands x 8 bits): banding is EXACT (pigeonhole at hamming<=6,
  pair equality asserted every rung) but does NOT prune — 256-value
  buckets cut candidates only a constant ~32x, and codegen integer
  hamming wins through 80k images (0.6-0.8x).
* phash256 (16 bands x 16 bits, threshold 12 <= 15 pigeonhole budget):
  same exactness guarantee, but 65536-value buckets make candidates
  n^2/65536 — the banded join WINS 1.1x/2.4x/2.7x at 5k/20k/80k and the
  gap widens with n. Band width must exceed log2(corpus) bits to prune.

The ladder replicates the paired corpus N times (pair structure preserved:
replica i shifts ids by i*2*span) and asserts banded==brute at every rung.

Usage: python tools/ahash_ladder.py [max_replication]
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
    phash256,
    synthesize_bitmaps_paired,
)
from dataselector_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
THRESH = 6


def _ids(spark, n):
    d = load_table(spark, SF, "documents").select("doc_id")
    span = 1_000_000
    reps = [
        d.select((F.col("doc_id") + F.lit(2 * i * span)).alias("doc_id"))
        for i in range(n)
    ]
    ids = reps[0]
    for r in reps[1:]:
        ids = ids.unionAll(r)
    return ids


def _hashes(spark, n):
    return ahash64(synthesize_bitmaps_paired(_ids(spark, n)))


WIDE_THRESH = 12


def _ham256(prefix_a, prefix_b):
    ham = None
    for k in range(8):
        t = F.bit_count(
            F.col(f"{prefix_a}.h{k}").bitwiseXOR(F.col(f"{prefix_b}.h{k}"))
        )
        ham = t if ham is None else ham + t
    return ham.cast("int")


def _banded256(hs):
    hcols = [f"h{k}" for k in range(8)]
    bands = hs.select(
        "doc_id",
        *hcols,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftright(F.col(f"h{i // 2}"), 16 * (i % 2))
                        .bitwiseAND(F.lit(65535))
                        .alias("val"),
                    )
                    for i in range(16)
                ]
            )
        ).alias("b"),
    ).select("doc_id", *hcols, "b.band", "b.val")
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
            _ham256("a", "b").alias("hamming"),
        )
        .filter(F.col("hamming") <= WIDE_THRESH)
        .distinct()
    )


def _brute256(hs):
    a, b = hs.alias("a"), hs.alias("b")
    return (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            _ham256("a", "b").alias("hamming"),
        )
        .filter(F.col("hamming") <= WIDE_THRESH)
    )


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
        for label, hash_fn, banded_fn, brute_fn in (
            ("ahash64 ", _hashes, _banded, _brute),
            (
                "phash256",
                lambda s_, k: phash256(synthesize_bitmaps_paired(_ids(s_, k))),
                _banded256,
                _brute256,
            ),
        ):
            hs = hash_fn(spark, n).localCheckpoint()  # hash build timed apart
            n_img = hs.count()
            banded, brute = banded_fn(hs), brute_fn(hs)
            _wall(banded)
            t_banded = _wall(banded)
            t_brute = _wall(brute)
            n_banded = banded.count()
            n_brute = brute.count()
            assert n_banded == n_brute, (n_banded, n_brute)  # exactness
            print(
                f"rep={n:>2} hash={label} images={n_img:>7,} "
                f"pairs={n_banded:>6,} banded={t_banded:6.2f}s "
                f"brute={t_brute:7.2f}s speedup={t_brute / t_banded:5.1f}x"
            )
        n *= 4


if __name__ == "__main__":
    main()
