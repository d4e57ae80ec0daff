"""A23/A24/A31 session-layer replay + properties (no Spark needed)."""

from __future__ import annotations

from hypothesis import given
from hypothesis import strategies as st

from dataselector_spark.operators.extents import Window1D, zoom_window
from dataselector_spark.session_state import HoldToggle, Limits, ZoomHistory

L1 = Limits(0.0, 10.0, 0.0, 1.0)
L2 = Limits(2.0, 8.0, 0.1, 0.9)
L3 = Limits(3.0, 7.0, 0.2, 0.8)


def test_zoom_record_dedupes_top():
    """Re-rendering the same view must not grow history (index.js:359-368)."""
    zh = ZoomHistory()
    assert zh.record("ethane", "date", "value", L1) is True
    assert zh.record("ethane", "date", "value", L1) is False
    assert zh.depth("ethane", "date", "value") == 1
    assert zh.record("ethane", "date", "value", L2) is True
    assert zh.depth("ethane", "date", "value") == 2


def test_zoom_undo_restores_previous_then_exhausts():
    zh = ZoomHistory()
    for lim in (L1, L2, L3):
        zh.record("ethane", "date", "value", lim)
    assert zh.undo("ethane", "date", "value") == L2
    assert zh.undo("ethane", "date", "value") == L1
    assert zh.undo("ethane", "date", "value") is None  # → full extents
    assert zh.undo("ethane", "date", "value") is None  # idempotent when empty


def test_zoom_stacks_independent_per_table_and_axes():
    zh = ZoomHistory()
    zh.record("ethane", "date", "value", L1)
    zh.record("ethane", "date", "lat", L2)
    zh.record("propane", "date", "value", L3)
    assert zh.current("ethane", "date", "value") == L1
    assert zh.current("ethane", "date", "lat") == L2
    assert zh.current("propane", "date", "value") == L3
    assert zh.current("propane", "date", "lat") is None


@given(st.lists(st.sampled_from([L1, L2, L3]), max_size=30))
def test_zoom_history_never_has_adjacent_duplicates(views):
    """Property: the push-if-changed rule means no two adjacent stack
    entries are ever equal, for any gesture sequence."""
    zh = ZoomHistory()
    for v in views:
        zh.record("t", "x", "y", v)
    stack = zh._stacks.get(("t", "x", "y"), [])
    assert all(a != b for a, b in zip(stack, stack[1:]))


def test_zoom_window_out_of_bounds_resets_to_full():
    """A23: dragging outside the data resets to full extent (index.js:230-234)."""
    full = Window1D(0.0, 100.0)
    assert zoom_window(-5.0, 50.0, full, 1.0) == full
    assert zoom_window(10.0, 150.0, full, 1.0) == full
    assert zoom_window(60.0, 40.0, full, 1.0) == full  # inverted


def test_zoom_window_floor_expands_to_min_window():
    """A23: a sub-minimum drag expands to a centered minimum window
    (index.js:235-240), clamped inside the full extent."""
    full = Window1D(0.0, 100.0)
    w = zoom_window(49.0, 51.0, full, 10.0)
    assert w.hi - w.lo == 10.0
    assert w.lo <= 49.0 and w.hi >= 51.0
    edge = zoom_window(0.0, 2.0, full, 10.0)
    assert edge.lo == 0.0 and edge.hi == 10.0


def test_hold_toggle_fires_on_nth_trigger_then_rearms():
    """A31 replay: fireOn=2 latch flips on the 2nd trigger and re-arms with
    the flipped state as the new base (index.js:902-926)."""
    ht = HoldToggle(fire_on=2, start_state=False)
    assert ht.trigger() is False
    assert ht.trigger() is True  # fires
    # re-armed with base=True: next cycle fires back to False on the 2nd
    assert ht.trigger() is True
    assert ht.trigger() is False
    ht.reset(False)
    assert ht.state() is False
    assert ht.ct == 0


def test_affine_map_invert_roundtrip(spark):
    """A11/A12: data→pixel scale and its inverse compose to identity (the
    shift-drag zoom's pixel→data path, index.js:225-228)."""
    import pyspark.sql.functions as F

    from dataselector_spark.operators.extents import affine_invert, affine_map

    df = spark.range(11).select((F.col("id") * 10.0).alias("v"))
    out = df.select(
        "v",
        affine_map(F.col("v"), 0.0, 100.0, 0.0, 640.0).alias("px"),
        affine_invert(
            affine_map(F.col("v"), 0.0, 100.0, 0.0, 640.0), 0.0, 100.0, 0.0, 640.0
        ).alias("back"),
    ).collect()
    for r in out:
        assert abs(r.back - r.v) < 1e-9
        assert 0.0 <= r.px <= 640.0


def test_nice_domain_matches_d3_examples():
    """A10: d3 scale.nice() replay — canonical examples from d3-scale's
    documented behavior (the reference nices every linear y-scale,
    index.js:310)."""
    from dataselector_spark.operators.extents import Window1D, nice_domain

    assert nice_domain(1.1, 10.9) == Window1D(1, 11)
    assert nice_domain(0.201, 0.996) == Window1D(0.2, 1.0)
    assert nice_domain(-13, 207) == Window1D(-20, 220)
    w = nice_domain(0, 0.96)
    assert w.lo == 0 and w.hi == 1.0
    assert nice_domain(5, 5) == Window1D(5, 5)  # degenerate domain unchanged
    # idempotence: nicing a nice domain is a no-op
    assert nice_domain(1, 11) == Window1D(1, 11)
