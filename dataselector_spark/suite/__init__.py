"""Named query suite — the driver-checkable contract (SURVEY.md §2).

Each entry pairs a PySpark callable `(spark, sf_dir) -> DataFrame` with an
equivalent ANSI-SQL oracle string for DuckDB (None → rows-only check for
genuinely non-SQL-expressible ops). `__spark_entry__.py` re-exports these.
"""

from .base import QUERIES, Query, query  # noqa: F401

# Importing registers every suite module's queries.
#
# Registration ORDER matters to the driver: its CORRECTNESS harness checks the
# first 50 entries in registration order.  Round 1 verified the first 50
# (reference_parity -> relational -> 4 window entries); those stay pinned by
# the local sf0.001 DuckDB oracle run (tests/test_suite_oracle.py).  Round 2
# therefore registers the previously-unchecked modules first so the driver's
# window lands on fresh surface: llm_pipeline (22) + streaming_suite (7) +
# tpch_full (11) + the first ~10 of extensions.
from . import llm_pipeline  # noqa: F401,E402
from . import streaming_suite  # noqa: F401,E402
from . import tpch_full  # noqa: F401,E402
from . import extensions  # noqa: F401,E402
from . import window_suite  # noqa: F401,E402
from . import reference_parity  # noqa: F401,E402
from . import relational  # noqa: F401,E402
from . import extras  # noqa: F401,E402

# Explicit window control: after llm_pipeline (22) + streaming_suite (7) +
# tpch_full (11) = 40 entries, promote exactly these 10 extensions entries so
# the round-2 driver window (first 50) covers ALL of b01_* (5 source/sink
# round-trips) and B21 (3 UDF forms) plus the two remaining Part-A/B7 gaps —
# the full "B12-B21, q2-q22, b01_*" target from VERDICT r1 item 1.
_PROMOTE = [
    "b01_parquet_roundtrip",
    "b01_csv_roundtrip",
    "b01_json_roundtrip",
    "b01_orc_roundtrip",
    "b01_text_roundtrip",
    "b21_pandas_udf_scalar",
    "b21_grouped_applyinpandas",
    "b21_python_udtf",
    "a29_cross_join",
    "b07_grouping_sets",
]
_rest = [n for n in QUERIES if n not in _PROMOTE]
_order = _rest[:40] + _PROMOTE + _rest[40:]
_reordered = {n: QUERIES[n] for n in _order}
QUERIES.clear()
QUERIES.update(_reordered)


def queries():
    return {name: q.fn for name, q in QUERIES.items()}


def oracle_sql():
    return {name: q.oracle for name, q in QUERIES.items() if q.oracle is not None}
