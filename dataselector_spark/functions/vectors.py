"""Vector math over `array<float>` columns, fully JVM-side.

Built on `F.zip_with` + `F.aggregate` higher-order functions: no Python in
the loop, no UDF serialization, and the expressions participate in
whole-stage codegen. Elements are cast to double before accumulating so the
fold is an IEEE-double sequential sum — deterministic and engine-comparable
(the DuckDB oracle accumulates the same way).

Scale: each row's cost is O(dim); similarity search drivers on top of these
(operators/similarity.py) control the number of row pairs (broadcast of the
query vector for top-k; LSH bucketing for all-pairs near-dup).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot_product(a: Column | str, b: Column | str) -> Column:
    prods = F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: Column | str) -> Column:
    a = _c(a)
    sq = F.transform(a, lambda x: x.cast("double") * x.cast("double"))
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, v: acc + v))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))
