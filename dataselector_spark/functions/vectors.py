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


def array_lit_d(values) -> Column:
    """array<double> literal built as ONE JVM-parsed SQL expression.

    `F.array(*[F.lit(float(x)) for x in vs])` costs a Py4J round-trip per
    element — ~65 driver calls for one 64-dim query vector, repeated per
    plane/centroid; profiled at >1 s of pure driver chatter per ANN entry
    build (r15). This helper emits `array(<v>D, ...)` as a single string:
    repr() of a Python float is the shortest decimal that round-trips, and
    Spark's `D`-suffixed literal parses via Double.parseDouble back to the
    identical IEEE double — BIT-EQUIVALENT to the F.lit path (verified for
    denormals, -0.0, and exponent forms), at ~1/65th the construction
    cost. Finite values only (inf/nan have no D-literal form; the callers
    build planes/centroids/query vectors, all finite by construction)."""
    return F.expr(
        "array(" + ",".join(repr(float(v)) + "D" for v in values) + ")"
    )


def dot_product(a: Column | str, b: Column | str) -> Column:
    prods = F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: Column | str) -> Column:
    a = _c(a)
    sq = F.transform(a, lambda x: x.cast("double") * x.cast("double"))
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, v: acc + v))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))
