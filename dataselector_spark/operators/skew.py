"""Skew-mitigated (salted) join — the manual fallback when AQE's runtime
skew splitting isn't enough (e.g. one key holding >5% of a 100 TB fact).

Technique: widen the hot key space by a factor S. The large/skewed side
gets a deterministic salt in [0, S) derived from a secondary column (or a
per-row hash), so one hot key spreads over S shuffle partitions; the other
side is replicated S times (explode over the salt range) so every salted
key still finds its match. Result set is IDENTICAL to the plain join —
verified by the suite oracle — at the cost of an S× blow-up of the smaller
side, which is why S stays small (4–16) and the replicated side should be
the smaller one.

AQE's skew-join handling (on in our session posture) makes this unnecessary
for moderate skew; keep it for the pathological tail, and prefer
broadcasting outright when the small side fits in memory.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT = "__salt"


def salt_column(buckets: int, *entropy_cols: str) -> Column:
    """Deterministic salt in [0, buckets): hash of the given columns (or a
    per-partition-stable row id when none are given). Deterministic inputs
    keep replay/tests stable across partitionings."""
    if entropy_cols:
        h = F.xxhash64(*[F.col(c) for c in entropy_cols])
    else:
        h = F.xxhash64(F.monotonically_increasing_id())
    return F.pmod(h, F.lit(buckets)).cast("int")


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str,
    buckets: int = 8,
    how: str = "inner",
    entropy_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Equi-join ``skewed ⋈ other`` on column ``on`` with the skewed side
    salted and the other side replicated ``buckets`` times. Join column name
    must match on both sides (like `df.join(other, "key")`).

    ``how`` is restricted to joins that preserve rows from the SKEWED side
    only (inner/left/left_semi/left_anti): the replicate-by-buckets encoding
    emits each unmatched ``other`` row once per bucket, so right/full outer
    would duplicate them ``buckets`` times."""
    allowed = {"inner", "left", "leftouter", "left_outer", "semi", "leftsemi",
               "left_semi", "anti", "leftanti", "left_anti"}
    if how.lower().replace("_", "") not in {h.replace("_", "") for h in allowed}:
        raise ValueError(
            f"salted_join: how={how!r} is not supported — the replicated side "
            "emits unmatched rows once per salt bucket under right/full outer "
            "joins. Flip the arguments (salt the other side) or use a plain "
            "join with AQE skew handling."
        )
    # Entropy must vary WITHIN a join key (a salt derived from the key alone
    # would put the whole hot key in one bucket again) — default to a
    # per-row hash; pass high-cardinality payload columns for a
    # partitioning-independent salt.
    s = skewed.withColumn(SALT, salt_column(buckets, *entropy_cols))
    r = other.withColumn(
        SALT, F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)).cast("array<int>"))
    )
    return s.join(r, [on, SALT], how).drop(SALT)
