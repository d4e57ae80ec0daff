"""transformWithStateInPandas (B20, Spark 4 arbitrary stateful processing):
environment pin + gated end-to-end run — VERDICT r8 "Next round" #3.

The container has no google.protobuf runtime, which the TWS Python worker
protocol requires (docs/SCALE.md "transformWithStateInPandas"); these tests
pin that limitation so the suite's posture is explicit: the processors are
real and API-complete TODAY, the runtime test self-activates the moment the
dependency appears, and until then the skip reason names the exact blocker.
"""

import importlib.util
import os

import pytest

from dataselector_spark.streaming.tws import (
    TWS_UNAVAILABLE_REASON,
    tws_available,
)

_OK, _REASON = tws_available()


def test_tws_environment_probe_matches_reality():
    """tws_available() must track the actual dependency, not a hardcoded
    answer — if protobuf ever gets installed, this flips automatically and
    the runtime test below starts running."""
    try:
        has_protobuf = importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:
        has_protobuf = False
    assert _OK is has_protobuf
    if not _OK:
        assert _REASON == TWS_UNAVAILABLE_REASON
        assert "google.protobuf" in _REASON


def test_tws_api_surface_importable_without_protobuf():
    """The limitation is EXECUTION-only: processor classes must construct
    and expose the full StatefulProcessor contract with protobuf absent."""
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    from dataselector_spark.streaming.tws import (
        _make_dedup_ttl_processor,
        _make_toggle_processor,
    )

    for proc in (_make_toggle_processor(), _make_dedup_ttl_processor(1000)):
        assert isinstance(proc, StatefulProcessor)
        for method in ("init", "handleInputRows", "close"):
            assert callable(getattr(proc, method))
    assert callable(
        getattr(_make_dedup_ttl_processor(1000), "handleExpiredTimer")
    )


@pytest.mark.skipif(_OK, reason="protobuf present: the real run covers this")
def test_tws_unavailable_raises_pinned_reason(spark):
    """Callers get the documented reason, not an opaque worker crash three
    stages deep."""
    from dataselector_spark.streaming.tws import toggle_stream_tws

    clicks = spark.createDataFrame(
        [("A", "2024-01-01 10:00")], "compound string, date_key string"
    )
    with pytest.raises(RuntimeError, match="google.protobuf"):
        toggle_stream_tws(clicks)


@pytest.mark.skipif(not _OK, reason=_REASON or "tws available")
def test_tws_toggle_carries_state_across_batches(spark, tmp_path):
    """Contract parity with the applyInPandasWithState toggle: identical
    assertions to test_streaming.test_stateful_toggle_carries_state_across
    _batches, driven through transformWithStateInPandas."""
    from pyspark.sql import functions as F

    from dataselector_spark.functions.keys import minute_key
    from dataselector_spark.streaming.tws import toggle_stream_tws
    from tests.test_streaming import EVENTS_PHYSICAL, _write_events

    src = str(tmp_path / "tws_toggle_src")
    os.makedirs(src)
    _write_events(os.path.join(src, "a.parquet"), [
        (1, "2024-01-01 10:00:00", 1, "A", 1.0),
        (2, "2024-01-01 10:05:00", 1, "A", 1.0),
    ])
    raw = spark.readStream.schema(EVENTS_PHYSICAL).parquet(src)
    clicks = raw.withColumn(
        "ts", F.timestamp_micros(F.expr("ts div 1000"))
    ).select(
        F.col("event_type").alias("compound"), minute_key("ts").alias("date_key")
    )
    q = (
        toggle_stream_tws(clicks)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("tws_toggle_test")
        .start()
    )
    try:
        q.processAllAvailable()
        _write_events(os.path.join(src, "b.parquet"), [
            (3, "2024-01-01 10:05:30", 1, "A", 1.0),
            (4, "2024-01-01 11:00:00", 1, "A", 1.0),
        ])
        q.processAllAvailable()
    finally:
        q.stop()
    rows = {
        (r.batch_seq, r.date_key): r.selected
        for r in spark.table("tws_toggle_test").collect()
    }
    assert rows[(1, "2024-01-01 10:00")] is True
    assert rows[(1, "2024-01-01 10:05")] is True
    assert rows[(2, "2024-01-01 10:05")] is False
    assert rows[(2, "2024-01-01 11:00")] is True
