"""Reference-behavior replay (SURVEY.md §5.3): the README.md:19-28 selection
algebra and the §1 ingest semantics exercised against the reference's own
example data (/root/reference/example/data — read-only fixture, measured
facts baked in as expected values)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from dataselector_spark.functions.keys import minute_key
from dataselector_spark.operators.selection import (
    KEY,
    apply_selections,
    compounds_by_date,
    export_selections,
    retract_compound,
    select_insert,
    select_toggle,
)
from dataselector_spark.sources.reference import (
    REFERENCE_DATA_DIR,
    load_compounds,
    load_flask_json,
)

ETHANE = f"{REFERENCE_DATA_DIR}/ethane.json"


@pytest.fixture(scope="module")
def ethane(spark):
    return load_flask_json(spark, ETHANE).cache()


def test_ingest_rows_and_derived_columns(ethane):
    """1080 rows (measured); ts/meas_ts/date_key/value_n derived, originals
    untouched (non-destructive, unlike index.js:400-402 in-place cast)."""
    assert ethane.count() == 1080
    types = dict(ethane.dtypes)
    assert types["ts"] == "timestamp"
    assert types["meas_ts"] == "timestamp"
    assert types["date"] == "double"  # original epoch column preserved
    assert types["date_key"] == "string"
    assert types["value_n"] == "double"


def test_utc_offset_applied(ethane):
    """ts = epoch + UTCCorrection*3600 (index.js:400-402, config.js:41=-2)."""
    row = ethane.select(
        F.unix_timestamp("ts").cast("double").alias("ts_epoch"), "date"
    ).first()
    assert row.ts_epoch == row.date + (-2) * 3600


def test_sentinel_normalization(ethane):
    """uncertainty is -999.99 in ALL 1080 ethane rows (measured) → all NULL
    after ingest; value carries 52 sentinel rows in this file (measured)."""
    assert ethane.filter(F.col("uncertainty_n").isNull()).count() == 1080
    assert ethane.filter(F.col("value_n").isNull()).count() == 52


def test_salted_key_vs_as_shipped_minute_collapse(ethane):
    """Documented intent (key = minute ⊕ flask_number, index.js:726-735)
    keeps same-minute flask pairs distinct: 1077 distinct keys over 1080
    rows. The as-shipped toolTipSalt bug (index.js:462 vs :63) collapses to
    minute-only keys: 549 — the 531 duplicated timestamps lose identity."""
    assert ethane.select("date_key").distinct().count() == 1077
    assert ethane.select(minute_key("ts")).distinct().count() == 549
    assert ethane.select("date").distinct().count() == 549


@pytest.fixture(scope="module")
def compounds(spark):
    return load_compounds(spark).cache()


def test_single_table_catalog(compounds):
    """7 compound files collapse into ONE species-keyed table (SURVEY.md
    §1.5): 7,433 rows total (6×1080 + 953), catalog lookup = filter."""
    assert compounds.count() == 7433
    assert compounds.select("species").distinct().count() == 7
    assert compounds.filter(F.col("species") == "C3H8").count() == 1080


def _sel(df, compound: str, n: int, offset: int = 0):
    """First n distinct keys of a compound as a (date_key, compound) batch —
    the relational stand-in for a box selection (index.js:245-250)."""
    keys = (
        df.select("date_key").distinct().orderBy("date_key")
        .limit(n + offset).orderBy(F.desc("date_key")).limit(n)
    )
    return keys.withColumn("compound", F.lit(compound))


def test_box_select_then_alt_drag_subset_is_symmetric_difference(spark, ethane):
    """README.md:22-24 replay: drag-select 20 points, then alt-drag a
    10-point subset → exactly the other 10 remain flagged."""
    empty = spark.createDataFrame([], f"{KEY} string, compound string")
    box = _sel(ethane, "ethane", 20)
    sel = select_insert(empty, box)
    assert sel.count() == 20
    subset = _sel(ethane, "ethane", 10)
    after = select_toggle(sel, subset)
    assert after.count() == 10
    # exactly box ∖ subset
    assert after.join(subset, [KEY, "compound"], "left_semi").count() == 0


def test_toggle_is_involution_on_real_keys(spark, ethane):
    """Alt-dragging the same box twice restores the original selection."""
    empty = spark.createDataFrame([], f"{KEY} string, compound string")
    base = select_insert(empty, _sel(ethane, "ethane", 15))
    hits = _sel(ethane, "ethane", 10, offset=5)
    twice = select_toggle(select_toggle(base, hits), hits)
    assert twice.count() == base.count()
    assert twice.exceptAll(base).count() == 0


def test_retract_leaves_no_empty_groups_and_export_sorted(spark, ethane, compounds):
    """Clearing a compound (cleanPlot, index.js:843-860) removes it from
    every date group; groups emptied by the retract vanish (index.js:524-526
    invariant). Export is date-key-sorted with sorted compound arrays."""
    empty = spark.createDataFrame([], f"{KEY} string, compound string")
    sel = select_insert(empty, _sel(ethane, "ethane", 10))
    sel = select_insert(sel, _sel(ethane, "propane", 6))  # overlapping keys
    sel = retract_compound(sel, "ethane")
    groups = compounds_by_date(sel).collect()
    assert all(len(r.compounds) >= 1 for r in groups)
    assert all("ethane" not in r.compounds for r in groups)
    exported = export_selections(sel).collect()
    keys = [r[KEY] for r in exported]
    assert keys == sorted(keys)
    assert all(r.compounds == sorted(r.compounds) for r in exported)


def test_apply_selections_semi_join_marks_membership(spark, ethane):
    """Render-time re-application (index.js:460-465): semi-join returns
    exactly the selected rows of the active compound's data."""
    empty = spark.createDataFrame([], f"{KEY} string, compound string")
    sel = select_insert(empty, _sel(ethane, "ethane", 12))
    marked = apply_selections(ethane, sel, "date_key")
    assert marked.select("date_key").distinct().count() == 12


def test_write_export_round_trips_reference_format(spark, ethane, tmp_path):
    """A21 sink: the exported JSON reloads to exactly the export relation —
    date keys with their sorted compound arrays (the distributed analogue of
    the reference's downloaded date->[compounds] map, index.js:818-836)."""
    from dataselector_spark.operators.selection import export_selections, write_export

    sel = select_insert(
        spark.createDataFrame([], f"{KEY} string, compound string"),
        _sel(ethane, "ethane", 8),
    )
    sel = select_insert(sel, _sel(ethane, "propane", 4))
    out = str(tmp_path / "export")
    write_export(sel, out)
    back = spark.read.schema("date_key string, compounds array<string>").json(out)
    want = {(r[KEY], tuple(r.compounds)) for r in export_selections(sel).collect()}
    got = {(r.date_key, tuple(r.compounds)) for r in back.collect()}
    assert got == want and len(got) > 0
