"""Differential test: every suite query with an oracle must hash-match DuckDB
(the driver's correctness gate, run here at sf0.001 for speed; the driver
runs sf0.01)."""

import pytest

from dataselector_spark.suite import QUERIES

from .oracle_harness import compare

ORACLE_QUERIES = [name for name, q in QUERIES.items() if q.oracle is not None]


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_match(spark, sf_dir, name):
    q = QUERIES[name]
    ok, detail = compare(spark, sf_dir, q.fn, q.oracle)
    assert ok, f"{name}: {detail}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
