"""Explicit schemas for every table the engine reads (no inference).

Two families:
  * the driver's synthetic star schema + LLM-pipeline tables
    (verified against /root/testdata/sf0.001/*.parquet — FIXTURES.md §A);
  * the reference's 29-field flask-measurement row
    (/root/reference/example/data/ethane.json:1 — FIXTURES.md §B), used by
    the reference-behavior replay layer (sources/reference.py).

Schema-on-read with an explicit StructType is the Spark analogue of the
reference's config-declared accessor maps (config.js:21-32): columns the
caller did not declare are simply never read (column pruning), and JSON
ingestion never pays an inference pass over 100 TB.
"""

from __future__ import annotations

from pyspark.sql import types as T

REGION = T.StructType(
    [
        T.StructField("r_regionkey", T.IntegerType()),
        T.StructField("r_name", T.StringType()),
    ]
)

NATION = T.StructType(
    [
        T.StructField("n_nationkey", T.IntegerType()),
        T.StructField("n_name", T.StringType()),
        T.StructField("n_regionkey", T.IntegerType()),
    ]
)

CUSTOMER = T.StructType(
    [
        T.StructField("c_custkey", T.LongType()),
        T.StructField("c_name", T.StringType()),
        T.StructField("c_nationkey", T.IntegerType()),
        T.StructField("c_acctbal", T.DoubleType()),
        T.StructField("c_mktsegment", T.StringType()),
    ]
)

SUPPLIER = T.StructType(
    [
        T.StructField("s_suppkey", T.LongType()),
        T.StructField("s_name", T.StringType()),
        T.StructField("s_nationkey", T.IntegerType()),
        T.StructField("s_acctbal", T.DoubleType()),
    ]
)

PART = T.StructType(
    [
        T.StructField("p_partkey", T.LongType()),
        T.StructField("p_name", T.StringType()),
        T.StructField("p_brand", T.StringType()),
        T.StructField("p_type", T.StringType()),
        T.StructField("p_size", T.IntegerType()),
        T.StructField("p_retailprice", T.DoubleType()),
    ]
)

ORDERS = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_custkey", T.LongType()),
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("o_totalprice", T.DoubleType()),
        T.StructField("o_orderdate", T.TimestampType()),
        T.StructField("o_orderpriority", T.StringType()),
    ]
)

LINEITEM = T.StructType(
    [
        T.StructField("l_orderkey", T.LongType()),
        T.StructField("l_partkey", T.LongType()),
        T.StructField("l_suppkey", T.LongType()),
        T.StructField("l_linenumber", T.IntegerType()),
        T.StructField("l_quantity", T.DoubleType()),
        T.StructField("l_extendedprice", T.DoubleType()),
        T.StructField("l_discount", T.DoubleType()),
        T.StructField("l_tax", T.DoubleType()),
        T.StructField("l_returnflag", T.StringType()),
        T.StructField("l_linestatus", T.StringType()),
        T.StructField("l_shipdate", T.TimestampType()),
    ]
)

# The events parquet stores ts as INT64 TIMESTAMP(NANOS), which Spark's
# parquet reader rejects outright (PARQUET_TYPE_ILLEGAL). Physical read
# schema takes the raw int64 nanos; catalog.load_table converts to a
# microsecond TimestampType via integer division — same truncation DuckDB
# applies, so oracle comparisons agree to the microsecond.
EVENTS_PHYSICAL = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]
)

TABLE_SCHEMAS: dict[str, T.StructType] = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}

# Reference flask-measurement row — 29 flat fields (ethane.json:1).
# `date`/`meas_date` arrive as epoch-seconds doubles; the derived timestamp
# (index.js:400-402) is produced non-destructively on ingest.
_FLASK_STRINGS = [
    "site_code",
    "flask_number",
    "collection_method",
    "species",
    "lab",
    "flag",
    "version",
]
_FLASK_INTS = [
    "year",
    "month",
    "day",
    "hour",
    "minute",
    "second",
    "meas_year",
    "meas_month",
    "meas_day",
    "meas_hour",
    "meas_minute",
    "meas_second",
    "event_number",
]
_FLASK_DOUBLES = [
    "value",
    "uncertainty",
    "lat",
    "lon",
    "alt",
    "elev",
    "sample_height",
    "date",
    "meas_date",
]

FLASK = T.StructType(
    [T.StructField(c, T.StringType()) for c in _FLASK_STRINGS]
    + [T.StructField(c, T.IntegerType()) for c in _FLASK_INTS]
    + [T.StructField(c, T.DoubleType()) for c in _FLASK_DOUBLES]
)

# Columns carrying the -999.99 missing-value sentinel (FIXTURES.md §B).
FLASK_SENTINEL_COLUMNS = ["value", "uncertainty"]
FLASK_SENTINEL = -999.99
