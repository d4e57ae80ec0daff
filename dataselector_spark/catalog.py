"""Catalog: name -> DataFrame over a scale-factor directory.

Spark analogue of the reference's literal name->path map
(/root/reference/example/config.js:8-15, looked up at index.js:393): here the
catalog is a thin resolver to `spark.read.parquet` with the explicit schema
from schemas.py, plus temp-view registration so every operator is equally
expressible through SQL.

Scale note: the reference re-fetches the whole file on every render
(index.js:397, no cache). We read lazily — Catalyst prunes columns and pushes
predicates into the parquet scan — and callers opt into `.cache()` only for
interactive sessions (see operators/selection.py). At 100 TB the per-"series"
file-per-compound layout collapses into one partitioned table (partition
column = series name), so catalog lookup becomes partition pruning, not a
file-path dict.
"""

from __future__ import annotations

import os
from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .schemas import EVENTS_PHYSICAL, TABLE_SCHEMAS

TABLES = tuple(TABLE_SCHEMAS)


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


@lru_cache(maxsize=None)
def events_ts_unit(path: str) -> str:
    """Physical unit of ``events.ts`` from the parquet footer ('ns' or 'us').

    The testdata generator has shipped both TIMESTAMP(NANOS) — which Spark's
    parquet reader rejects outright, forcing the raw-int64 shim below — and
    plain timestamp[us], which Spark reads natively. Hardcoding either unit
    silently mis-scales every event timestamp by 1000× when the data is
    regenerated with the other one, so we probe the footer (metadata-only
    read, no row groups) and branch. Cached per path; ``path`` may be a file
    or a directory of part files.
    """
    import pyarrow.parquet as pq

    probe = path
    if os.path.isdir(path):
        for entry in sorted(os.listdir(path)):
            if entry.endswith(".parquet"):
                probe = os.path.join(path, entry)
                break
    t = pq.read_schema(probe).field("ts").type
    return getattr(t, "unit", "us")


def ensure_session_defaults(spark: SparkSession) -> None:
    """Pin the two session settings the engine's semantics depend on, since
    the session may be caller-owned (the driver builds its own):

    * UTC timezone — timestamp→string keys (functions/keys.py) must be
      location-independent and oracle-comparable;
    * ANSI off — the engine declares permissive SQL semantics: hash mixing
      (operators/dedup.py) uses wrapping int64 arithmetic, which Spark 4's
      default ANSI mode would reject with ARITHMETIC_OVERFLOW.
    """
    if spark.conf.get("spark.sql.session.timeZone") != "UTC":
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    if spark.conf.get("spark.sql.ansi.enabled") != "false":
        spark.conf.set("spark.sql.ansi.enabled", "false")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one table with its declared schema (no inference pass)."""
    ensure_session_defaults(spark)
    if name not in TABLE_SCHEMAS:
        raise KeyError(f"unknown table {name!r}; catalog has {sorted(TABLE_SCHEMAS)}")
    path = table_path(sf_dir, name)
    if name == "events" and events_ts_unit(path) == "ns":
        # ts is parquet TIMESTAMP(NANOS) — illegal for Spark's reader; take
        # the raw int64 and truncate ns -> µs exactly as DuckDB does.
        raw = spark.read.schema(EVENTS_PHYSICAL).parquet(path)
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000"))).select(
            *[f.name for f in TABLE_SCHEMAS[name].fields]
        )
    # timestamp[us] (possibly NTZ) reads natively with the declared
    # TimestampType schema: under the UTC session pin this is the same
    # wall-clock DuckDB sees, microsecond-exact.
    return spark.read.schema(TABLE_SCHEMAS[name]).parquet(path)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every table that exists under ``sf_dir``."""
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        if os.path.exists(table_path(sf_dir, name)):
            out[name] = load_table(spark, sf_dir, name)
    return out


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load all tables and register them as temp views (SQL entry point)."""
    tables = load_tables(spark, sf_dir)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables
