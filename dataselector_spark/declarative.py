"""Spark Declarative Pipelines (SDP, Spark 4.1 `pyspark.pipelines`) —
API-complete definitions + environment pin, the transformWithState
treatment (docs/SCALE.md, tests/test_tws.py) applied to the second
modern-API class this container cannot execute.

SDP is the Spark 4.1 way to declare a dataflow graph of materialized
views / streaming tables with dependency-ordered refresh: decorate
query functions with @materialized_view / @table, run the graph with
the `spark-pipelines` CLI (present at /opt/spark/bin/spark-pipelines).
Execution here is blocked one import deep: the CLI boots a Spark
Connect client, and grpcio is not installed in this container
(`[PACKAGE_NOT_INSTALLED] grpcio >= 1.48.1`). The definitions below
are real SDP graph elements TODAY — registering them outside a
pipeline run raises the SDP-specific
GRAPH_ELEMENT_DEFINED_OUTSIDE_OF_DECLARATIVE_PIPELINE error, which the
tests pin as proof they hit the actual registry gate, not a stub — and
the gated end-to-end test self-activates the moment grpcio appears.

At 100 TB the SDP value proposition is the same as the suite's
incremental-materialization entries (b23_incremental_agg, streaming
b17-b20), lifted to the GRAPH level: declare every derived table once,
let the runner topologically order refreshes, incrementalize streaming
tables from checkpoints, and re-materialize only what a change
invalidates — the orchestration layer the per-operator entries
deliberately leave to the caller.
"""

from __future__ import annotations

import importlib.util
import os
import textwrap

SDP_UNAVAILABLE_REASON = (
    "grpcio (Spark Connect client) is not installed; the spark-pipelines "
    "runner imports pyspark.sql.connect which requires grpcio >= 1.48.1"
)


def sdp_available() -> tuple[bool, str]:
    """Probe whether Declarative Pipelines can EXECUTE here (the API
    itself imports fine without grpc). find_spec can raise
    ModuleNotFoundError for namespace parents — same guard as the
    protobuf probe in streaming/tws.py."""
    try:
        has_grpc = importlib.util.find_spec("grpc") is not None
    except ModuleNotFoundError:
        has_grpc = False
    return (True, "") if has_grpc else (False, SDP_UNAVAILABLE_REASON)


def register_event_pipeline(sf_dir: str) -> None:
    """Define the flagship dataflow as SDP graph elements: a temporary
    view over the raw events parquet, a materialized per-(minute, type)
    count table on top of it, and a daily rollup on top of THAT — a
    three-node dependency chain the runner must topologically order.

    Only callable inside a pipeline run: each decorator registers into
    the active graph-element registry and raises
    GRAPH_ELEMENT_DEFINED_OUTSIDE_OF_DECLARATIVE_PIPELINE otherwise
    (pinned in tests/test_declarative_pipelines.py).
    """
    from pyspark.pipelines import materialized_view, temporary_view
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = SparkSession.getActiveSession()

    @temporary_view
    def events_raw():
        return spark.read.parquet(os.path.join(sf_dir, "events.parquet"))

    @materialized_view
    def minute_type_counts():
        return (
            spark.read.table("events_raw")
            .groupBy(
                F.date_trunc("minute", F.col("ts")).alias("minute"),
                "event_type",
            )
            .agg(F.count(F.lit(1)).alias("n"))
        )

    @materialized_view
    def daily_type_counts():
        return (
            spark.read.table("minute_type_counts")
            .groupBy(
                F.to_date(F.col("minute")).alias("day"), "event_type"
            )
            .agg(F.sum("n").alias("n"))
        )


def write_pipeline_project(project_dir: str, sf_dir: str) -> str:
    """Materialize a runnable SDP project (spark-pipeline.yaml + the
    transformation module calling register_event_pipeline) so the gated
    end-to-end test — and any grpc-equipped environment — can run
    `spark-pipelines run` against it. Returns the spec path."""
    os.makedirs(os.path.join(project_dir, "transformations"), exist_ok=True)
    spec = os.path.join(project_dir, "spark-pipeline.yaml")
    with open(spec, "w") as f:
        f.write(
            textwrap.dedent(
                f"""\
                name: dsspark_events
                storage: {project_dir}/storage
                libraries:
                  - include: transformations/**
                """
            )
        )
    with open(
        os.path.join(project_dir, "transformations", "events_graph.py"), "w"
    ) as f:
        f.write(
            textwrap.dedent(
                f"""\
                import sys

                sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r})

                from dataselector_spark.declarative import (
                    register_event_pipeline,
                )

                register_event_pipeline({sf_dir!r})
                """
            )
        )
    return spec
