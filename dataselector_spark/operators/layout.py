"""Storage-layout clustering: z-order (Morton) keys for multi-column
pruning — SURVEY.md §2 B22/B24 (curation / storage layout).

Single-column sort layouts prune scans on ONE predicate column only; a
100 TB corpus queried by (user, time) or (source, quality) needs row groups
that are narrow in BOTH. Interleaving the bits of the normalized columns
(the Morton / z-order curve) gives each row group a small bounding box in
every clustered dimension, so parquet min/max row-group stats skip data for
predicates on ANY of them — the same layout trick behind Delta/Iceberg
`OPTIMIZE ZORDER BY`, expressed here as plain Spark expressions + a
`repartitionByRange(zkey).sortWithinPartitions(zkey)` write.

Everything is JVM-side integer bit arithmetic (`shiftleft`/`shiftright`/
`&`/`|` inside whole-stage codegen) — no UDFs — and the key formula is
engine-replayable SQL, so the suite entry value-checks every key bit
against DuckDB (`zorder_key_sql` generates the identical expression).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(cols: list[Column], bits: int = 8) -> Column:
    """Interleave the low ``bits`` bits of each (already-normalized,
    non-negative integer) column into one Morton key: bit ``b`` of column
    ``i`` lands at position ``b * len(cols) + i``. Caller normalizes each
    dimension into ``[0, 2**bits)`` (modulo a hash, a range bucket, …);
    the interleave itself is exact and engine-portable."""
    key = F.lit(0).cast("long")
    n = len(cols)
    for b in range(bits):
        for i, c in enumerate(cols):
            bit = F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, b * n + i))
    return key


def zorder_key_sql(col_exprs: list[str], bits: int = 8) -> str:
    """The identical Morton interleave as ANSI/DuckDB SQL over the given
    (normalized, non-negative integer) column expressions — used by suite
    oracles to replay `zorder_key` bit-for-bit."""
    n = len(col_exprs)
    terms = [
        f"((({c} >> {b}) & 1) << {b * n + i})"
        for b in range(bits)
        for i, c in enumerate(col_exprs)
    ]
    return " | ".join(terms)


def cluster_by_zorder(
    df: DataFrame, key: Column, partitions: int | None = None
) -> DataFrame:
    """Arrange ``df`` so a columnar write produces z-clustered files:
    range-partition on the z-key (each output file covers a contiguous key
    range → a small bounding box in every clustered dimension), then sort
    within partitions so row groups inside each file are narrow too.
    This is a full shuffle — a WRITE-TIME cost paid once, like bucketing;
    every subsequent multi-dimension predicate scan prunes against it."""
    keyed = df.withColumn("__zkey", key)
    parted = (
        keyed.repartitionByRange(partitions, "__zkey")
        if partitions
        else keyed.repartitionByRange("__zkey")
    )
    return parted.sortWithinPartitions("__zkey").drop("__zkey")
