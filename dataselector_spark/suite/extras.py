"""Round-2+ additions to the suite, registered LAST on purpose.

The driver's CORRECTNESS harness checks the first 50 entries in registration
order (see suite/__init__.py); that window is budgeted round-by-round. New
entries land here so they never silently displace an entry already scheduled
for a driver check — they get their own rows when the window rotates.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.similarity import _pseudo_planes, neardup_pairs_cosine
from .base import query

_DIM = 64  # embeddings.embedding width (TESTDATA.md)
_PLANES = _pseudo_planes(_DIM, 8, seed=42)


def _sql_dot_literal(vec_expr: str, plane: list[float]) -> str:
    """DuckDB fold of vec · plane-literal, accumulation order identical to
    functions/vectors.py dot_product (sequential left fold of per-index
    products, double arithmetic)."""
    lits = "[" + ", ".join(repr(x) for x in plane) + "]"
    return f"""list_reduce(list_prepend(CAST(0 AS DOUBLE),
        list_transform(range(1, {_DIM} + 1),
            i -> CAST({vec_expr}[i] AS DOUBLE) * CAST(({lits})[i] AS DOUBLE))),
        (x, y) -> x + y)"""


def _sql_signature(vec_expr: str) -> str:
    """8-bit sign-LSH signature, mirroring operators/similarity.py
    sign_lsh_signature: bit h = [vec · plane_h >= 0]."""
    terms = [
        f"(CASE WHEN {_sql_dot_literal(vec_expr, p)} >= 0 THEN {1 << h} ELSE 0 END)"
        for h, p in enumerate(_PLANES)
    ]
    return "(" + " + ".join(terms) + ")"


@query(
    "b14_embedding_neardup_lsh",
    oracle=f"""
    WITH base AS (
        SELECT vec_id,
               {_sql_signature("embedding")} AS sig,
               embedding,
               sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
                   (a, b) -> a + b)) AS nrm
        FROM embeddings
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(range(1, {_DIM} + 1),
                              i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))),
               (x, y) -> x + y) / (a.nrm * b.nrm) AS cosine
    FROM base a JOIN base b ON a.sig = b.sig AND a.vec_id < b.vec_id
    WHERE list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(range(1, {_DIM} + 1),
                              i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))),
               (x, y) -> x + y) / (a.nrm * b.nrm) >= 0.2
    """,
    doc="B14 (scale path): embedding near-dup pairs blocked by the 8-bit "
    "sign-LSH signature instead of a low-cardinality attribute — expected "
    "block size |corpus|/2^8, so no block is ever a corpus fraction "
    "(VERDICT r1 item 5). Recall vs the single-block ground truth asserted "
    "in tests/test_llm_ops.py; here the oracle replays the identical "
    "signature arithmetic (plane literals embedded) for a value-checked row.",
)
def b14_embedding_neardup_lsh(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    return neardup_pairs_cosine(
        e, None, threshold=0.2, num_planes=8, dim=_DIM, seed=42
    )
