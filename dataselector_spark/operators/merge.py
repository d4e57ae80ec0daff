"""Incremental-refresh operators: keyed upsert (MERGE/SCD-1) and CDC
changelog compaction.

The reference's session model is itself an upsert store — `updateClicked`
inserts or replaces a date-key's membership and `commitSelections` folds the
working set over the committed maps (reference index.js:510-534, 797-813).
These operators are the batch, keyed-table generalization: the pattern every
large-scale training-data pipeline needs to refresh a materialized corpus
from a delta feed without a transactional table format.

Scale posture (100 TB): both operators are a single shuffle on the merge
key. `merge_upsert` is anti-join + union — with both sides bucketed by key
the anti-join is co-located and shuffle-free; the union is append-only.
`apply_changelog` is one `row_number()` window per key (max-version wins),
which AQE handles under skew; state never exceeds one row per key after the
window filter. Writing the result with `partitionBy` + dynamic partition
overwrite gives the Delta-style MERGE sink without a table format (no extra
jars in this container — see sources/__init__.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_upsert(target: DataFrame, source: DataFrame, keys: Sequence[str]) -> DataFrame:
    """SCD-1 MERGE: source rows win on key collision, unmatched target rows
    survive, new source keys are inserted.

    Equivalent SQL: target ANTI JOIN source ON keys, UNION ALL source.
    Columns must be union-compatible by name.

    NULL-key semantics: keys are compared null-safely (``<=>``), so a
    NULL-key source row REPLACES a NULL-key target row instead of both
    surviving — without this, repeated merges of a NULL-key feed accumulate
    one duplicate per run (a plain anti-join never matches NULL = NULL).
    """
    cond = [target[k].eqNullSafe(source[k]) for k in keys]
    return target.join(source, cond, "left_anti").unionByName(source)


def apply_changelog(
    changelog: DataFrame,
    keys: Sequence[str],
    version_col: str,
    op_col: str = "op",
    delete_op: str = "D",
    tiebreakers: Sequence[str] = (),
) -> DataFrame:
    """Compact a CDC changelog (key, version, op, payload...) to current
    state: the highest-version row per key wins; a winning delete removes
    the key entirely.

    Ties on version are broken by preferring the delete (a delete and an
    upsert at the same version compact to absence); remaining ties fall to
    ``tiebreakers`` (payload columns), which the caller must supply whenever
    (key, version) is not unique — otherwise the surviving payload is
    arbitrary. With a total order the operator is deterministic on
    adversarial input.
    """
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(
        F.col(version_col).desc(),
        F.when(F.col(op_col) == delete_op, 0).otherwise(1).asc(),
        *[F.col(c) for c in (tiebreakers or [])],
    )
    return (
        changelog.withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") == 1) & (F.col(op_col) != delete_op))
        .drop("__rn")
    )
