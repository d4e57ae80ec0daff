"""Ingest for the reference's own data layout (SURVEY.md §1).

The reference catalogs one JSON array file per compound
(/root/reference/example/config.js:8-15) and re-fetches whole files per
render (index.js:397). Here the same files load once through an explicit
29-field schema (FIXTURES.md §B) with the reference's ingest semantics
applied declaratively:

* epoch-seconds → timestamp with the configured UTC offset correction
  (index.js:400-402, offset config.js:41) — non-destructive derived columns
  `ts` / `meas_ts` instead of in-place mutation;
* -999.99 missing-value sentinels → SQL NULL (`value_n`, `uncertainty_n`);
* the documented composite record key `date_key` = minute-truncated
  timestamp + flask_number salt (formatISODate, index.js:726-735 — the
  as-shipped widget loses the salt to the toolTipSalt bug, index.js:462/63;
  we implement the documented intent, replay tests cover both).

At scale: one partitioned table (partition column `species`) replaces the
file-per-compound catalog — lookup becomes partition pruning (SURVEY.md §1.5).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import ensure_session_defaults
from ..functions.cleaning import sentinel_to_null
from ..functions.keys import composite_key
from ..schemas import FLASK, FLASK_SENTINEL, FLASK_SENTINEL_COLUMNS

REFERENCE_DATA_DIR = "/root/reference/example/data"
UTC_OFFSET_HOURS = -2  # config.js:41 (UTCCorrection)


def load_flask_json(
    spark: SparkSession,
    path: str,
    utc_offset_hours: int = UTC_OFFSET_HOURS,
) -> DataFrame:
    """One compound file (JSON array of flat objects) → typed DataFrame with
    derived timestamp, null-normalized sentinels, and the composite key."""
    ensure_session_defaults(spark)
    df = spark.read.schema(FLASK).option("multiLine", "true").json(path)
    df = df.withColumn(
        "ts", F.timestamp_seconds(F.col("date") + utc_offset_hours * 3600)
    ).withColumn(
        "meas_ts", F.timestamp_seconds(F.col("meas_date") + utc_offset_hours * 3600)
    )
    for c in FLASK_SENTINEL_COLUMNS:
        df = df.withColumn(f"{c}_n", sentinel_to_null(c, FLASK_SENTINEL))
    return df.withColumn("date_key", composite_key("ts", "flask_number"))


def load_compounds(
    spark: SparkSession,
    data_dir: str = REFERENCE_DATA_DIR,
    compounds: list[str] | None = None,
) -> DataFrame:
    """All compound files as ONE DataFrame (the species column already
    identifies the series — the scale-correct single-table layout)."""
    if compounds is None:
        compounds = sorted(
            f[: -len(".json")]
            for f in os.listdir(data_dir)
            if f.endswith(".json")
        )
    parts = [
        load_flask_json(spark, os.path.join(data_dir, f"{c}.json")) for c in compounds
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
