"""Query registry plumbing."""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

QueryFn = Callable[[SparkSession, str], DataFrame]


def dec2(col: Column | str, precision: int = 12) -> Column:
    """Exact 2-dp decimal view of a 2-dp double column.

    Lives here (not in `relational`) so that suite modules sharing it do not
    trigger each other's query registration — registration ORDER is part of
    the driver contract (see suite/__init__.py).
    """
    col = F.col(col) if isinstance(col, str) else col
    return col.cast(f"decimal({precision},2)")


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str = ""


QUERIES: dict[str, Query] = {}


def oracle_table_refs(sql: str) -> tuple[set[str], set[str]]:
    """(table references, CTE names) in a DuckDB oracle, lower-cased.

    Conservative lexical scan: string literals are stripped first (so
    read_parquet path contents never match), CTE names are anything bound by
    ``<name> AS (``, and a table reference is an identifier directly after
    FROM/JOIN that is not immediately called like a function
    (``read_parquet(...)``, ``range(...)``, ``unnest(...)``)."""
    import re

    s = re.sub(r"'[^']*'", "''", sql)
    ctes = {m.group(1).lower() for m in re.finditer(r"(?i)\b(\w+)\s+as\s*\(", s)}
    refs = set()
    for m in re.finditer(r"(?i)\b(?:from|join)\s+([a-zA-Z_][\w]*)\s*(\()?", s):
        if not m.group(2):  # identifier, not a function call / subquery
            refs.add(m.group(1).lower())
    return refs, ctes


def check_oracle_tables(queries: dict[str, Query], known_tables: set[str]) -> None:
    """Import-time guard (VERDICT r4 'Next round' #9): every oracle may only
    reference driver-registered views (TABLE_SCHEMAS) or its own CTEs —
    anything else would crash or silently diverge in the driver's DuckDB run,
    burning a correctness round. Raises listing every offending entry."""
    bad = {}
    for name, q in queries.items():
        if q.oracle is None:
            continue
        refs, ctes = oracle_table_refs(q.oracle)
        unknown = refs - known_tables - ctes - {"lateral"}
        if unknown:
            bad[name] = sorted(unknown)
    if bad:
        raise ValueError(
            f"oracle SQL references tables the driver never registers: {bad}"
        )


def query(name: str, oracle: str | None = None, doc: str = ""):
    """Register a named suite query with its optional DuckDB oracle SQL.

    Raises on duplicate names: a silent overwrite would orphan the earlier
    entry's driver-correctness record while dropping its test coverage
    (this bit round 3 — two modules both registered ``b01_orc_roundtrip``
    and the later import silently won; ADVICE.md r3 #1).
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(
                f"duplicate suite entry {name!r}: already registered by "
                f"{QUERIES[name].fn.__module__}; rename one of them"
            )
        QUERIES[name] = Query(name, fn, oracle, doc or (fn.__doc__ or ""))
        return fn

    return deco
