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
