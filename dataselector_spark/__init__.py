"""dataselector_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of brendano257/DataSelector, re-expressed
Spark-first and extended with LLM-data-pipeline operators.

The reference (/root/reference/index.js) is a browser widget for time-series
QC; its data-plane semantics (scan, projection, derived timestamp columns,
conjunctive range predicates, extent aggregation, composite keys, selection
set algebra, inverted-index pivots, grouped sorted export) are rebuilt here as
declarative DataFrame plans so Catalyst/Tungsten pick the physical strategy.

Layout:
    session     — tuned SparkSession factory (AQE, UTC, arrow, shuffle parts)
    schemas     — explicit StructTypes for every table (no inference)
    catalog     — name -> DataFrame catalog over a scale-factor directory
    functions/  — scalar/column expression library (keys, cleaning, text, vectors)
    operators/  — composed relational operators (selection algebra, dedup,
                  as-of / interval joins, windows, top-k similarity, export)
    sources/    — readers incl. the reference's flask-measurement JSON
    streaming/  — Structured Streaming variants (tumbling/sliding/session
                  windows, watermarks, stateful dedup)
    multimodal/ — binary-column plumbing for image/audio payloads (decode
                  stubbed; Spark-side schema/partitioning/UDF shape real)
    plans/      — explain/inspection helpers used to verify physical plans
"""

__version__ = "0.1.0"
