"""Dev-time stand-in for the driver's DuckDB-oracle compare.

Runs a `queries()` callable on Spark and the matching `oracle_sql()` string on
DuckDB over the same parquet directory, then compares row count, column-name
set, and an order-insensitive canonicalized value multiset.

Both sides are materialized THROUGH PANDAS (`toPandas()` / `.df()`), matching
the driver's canonicalization path: a DuckDB HUGEINT sum that pandas widens to
float64 will mismatch a Spark int64 here exactly as it does in the driver
(the round-2 `b15_lang_summary` failure class). Floats are compared via `repr`
of the double (bit-exact) so cross-engine nondeterminism surfaces during
development instead of in the driver's CORRECTNESS report.
"""

from __future__ import annotations

import datetime as _dt
import math
import os

import duckdb
import numpy as np
import pandas as pd

TABLE_NAMES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    return con


def _to_py(v):
    """Collapse numpy/pandas scalars and containers to plain Python values."""
    if v is None or v is pd.NaT:
        return None
    if isinstance(v, np.generic):
        v = v.item()
    if isinstance(v, np.ndarray):
        return tuple(_to_py(x) for x in v)
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime()
    if isinstance(v, (list, tuple)):
        return tuple(_to_py(x) for x in v)
    if isinstance(v, dict):
        return tuple((k, _to_py(x)) for k, x in sorted(v.items()))
    return v


def _canon_value(v):
    v = _to_py(v)
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "f:nan"
        return f"f:{v!r}"
    if isinstance(v, _dt.datetime):
        return "t:" + v.replace(tzinfo=None).isoformat()
    if isinstance(v, _dt.date):
        return "d:" + v.isoformat()
    if isinstance(v, tuple):
        return "[" + ",".join(_canon_value(x) for x in v) + "]"
    if isinstance(v, bytes):
        return "x:" + v.hex()
    if isinstance(v, int):
        return f"i:{v}"
    return f"s:{v}"


def _canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(_canon_value(r[i]) for i in order) for r in rows)


def _frame_rows(pdf: pd.DataFrame):
    return [tuple(row) for row in pdf.itertuples(index=False, name=None)]


def compare(spark, sf_dir: str, query_fn, oracle_sql: str):
    """Return (ok, detail). Spark result vs DuckDB oracle, both via pandas."""
    sdf = query_fn(spark, sf_dir)
    s_pdf = sdf.toPandas()
    s_cols = list(s_pdf.columns)
    s_rows = _frame_rows(s_pdf)

    con = duckdb_con(sf_dir)
    d_pdf = con.execute(oracle_sql).df()
    d_cols = list(d_pdf.columns)
    d_rows = _frame_rows(d_pdf)

    problems = []
    if sorted(s_cols) != sorted(d_cols):
        problems.append(f"columns: spark={sorted(s_cols)} duckdb={sorted(d_cols)}")
    if len(s_rows) != len(d_rows):
        problems.append(f"rowcount: spark={len(s_rows)} duckdb={len(d_rows)}")
    if not problems:
        cs, cd = _canon_rows(s_cols, s_rows), _canon_rows(d_cols, d_rows)
        if cs != cd:
            diff_s = [r for r in cs if r not in set(cd)][:5]
            diff_d = [r for r in cd if r not in set(cs)][:5]
            problems.append(f"values: spark-only={diff_s} duckdb-only={diff_d}")
    return (not problems, "; ".join(problems) or f"ok ({len(s_rows)} rows)")
