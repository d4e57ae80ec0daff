"""Testdata-drift tripwire (VERDICT r4 "Next round" #2).

Round 4 burned an entire driver round because the testdata generator switched
``events.ts`` from parquet TIMESTAMP(NANOS) to timestamp[us] and the loader
kept dividing by 1000 — every 2024 timestamp collapsed into 43 minutes of
1970 and 10 driver rows + 42 pytest cases went red with no loud failure at
the source.  These checks make a regen fail CI immediately:

* per table: ``catalog.load_table`` row count == the parquet footer's own
  row count (pyarrow metadata, no data read);
* ``events.ts``: min/max through the loader fall inside the generator's
  documented 2024 window (TESTDATA.md) — a unit mis-scale lands decades away
  from that range, so this catches ÷1000/×1000 in either direction.
"""

import datetime
import os

import pyarrow.parquet as pq
import pytest

from dataselector_spark.catalog import TABLES, load_table, table_path

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", TABLES)
def test_loader_rowcount_matches_footer(spark, name):
    path = table_path(SF_DIR, name)
    if not os.path.exists(path):
        pytest.skip(f"{name} not generated at {SF_DIR}")
    footer_rows = pq.ParquetFile(path).metadata.num_rows
    assert load_table(spark, SF_DIR, name).count() == footer_rows


def test_events_ts_in_generator_range(spark):
    lo, hi = (
        load_table(spark, SF_DIR, "events")
        .selectExpr("min(ts)", "max(ts)")
        .first()
    )
    # Generator writes one month of 2024 events (TESTDATA.md). A timestamp
    # unit mis-scale puts values in 1970 (÷1000) or year ~56946 (×1000).
    assert lo >= datetime.datetime(2024, 1, 1), lo
    assert hi <= datetime.datetime(2025, 1, 1), hi
    # and the span must be days, not minutes: ÷1000 compresses the whole
    # month into <1 hour even if the absolute range check were loosened.
    assert (hi - lo) >= datetime.timedelta(days=7), (lo, hi)


def test_events_ts_matches_duckdb(spark):
    """Spark's loader and DuckDB must see the SAME wall-clock instants —
    this is the exact invariant the driver's oracle harness depends on."""
    import duckdb

    path = table_path(SF_DIR, "events")
    d_lo, d_hi, d_n = duckdb.sql(
        f"select min(ts), max(ts), count(*) from read_parquet('{path}')"
    ).fetchone()
    s_lo, s_hi, s_n = (
        load_table(spark, SF_DIR, "events")
        .selectExpr("min(ts)", "max(ts)", "count(*)")
        .first()
    )
    assert (s_lo, s_hi, s_n) == (d_lo, d_hi, d_n)


@pytest.mark.parametrize(
    "name,col,lo_year,hi_year",
    [
        ("orders", "o_orderdate", 1990, 2010),
        ("lineitem", "l_shipdate", 1990, 2010),
    ],
)
def test_tpch_dates_in_generator_range(spark, name, col, lo_year, hi_year):
    """Same unit-mis-scale tripwire for the TPC-H date columns: a silent
    ns/us/NTZ drift lands decades outside the generator's mid-1990s-to-2001
    span (bounds deliberately loose — only a 1000x unit error must trip)."""
    lo, hi = (
        load_table(spark, SF_DIR, name)
        .selectExpr(f"min({col})", f"max({col})")
        .first()
    )
    assert lo.year >= lo_year, lo
    assert hi.year <= hi_year, hi
