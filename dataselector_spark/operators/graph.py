"""Co-occurrence graph construction — the shared edge build behind the
SURVEY.md §2 B26 graph family (triangles, clustering coefficient, PageRank,
assortativity, BFS, k-core, SSSP).

The family's graph is "users who shared an (event_type, time-bucket) cell":
nodes are users, an edge exists when two users appear in the same cell.  The
edge build is a self-join of the distinct cell-membership relation on the
cell key — quadratic PER CELL.  On a healthy corpus cells are small and the
join is cheap; a single flash-crowd cell (one event_type minute holding 10^4+
users) silently turns it into a 10^8-pair hot partition — the same
degenerate-cartesian failure mode `operators/rangejoin.py` probes for on the
time axis (its round-4 corrupted-timestamp incident: 0.44 s -> 34 s at
sf0.1; at 100 TB a cluster outage).  This module ports that sampled probe to
the cell axis so the quadratic join WARNS LOUDLY before it runs
(VERDICT r9 "Next round" #2), and gives the family one shared, audited
entry point instead of seven hand-rolled copies of the join.

Scale contract (100 TB): the probe is a 1‰ sampled census (exact fallback
only when the input is small enough that exact is cheap), cached per logical
plan for the process lifetime; the edge join itself shuffles once on the
cell key, and the b26_cooccurrence_skew_guard suite entry is the exact
census a pipeline runs FIRST to decide whether to cap, salt, or drop hot
cells before paying for the join.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: (semanticHash, frac, sample_fraction) -> probe already ran in this
#: process (the rangejoin._SKEW_PROBE_SEEN pattern: bench reps and repeated
#: plan construction over the same input pay the probe jobs once).  ADVICE
#: r10: the key carries EVERY probe parameter — a later call with a
#: different sample_fraction is a different probe, not a cache hit — and
#: the set is bounded (FIFO eviction) so a long-lived process composing
#: many distinct plans cannot grow it without limit.
_CELL_PROBE_SEEN: dict[tuple[int, float, float], None] = {}
_CELL_PROBE_SEEN_MAX = 4096


def cooccurrence_cells(
    events: DataFrame, bucket_seconds: int, ts_col: str = "ts"
) -> DataFrame:
    """The distinct (event_type, bucket, user_id) cell-membership relation —
    one row per user per cell they appear in."""
    return events.select(
        "event_type",
        F.floor(F.col(ts_col).cast("long") / bucket_seconds)
        .cast("bigint")
        .alias("bucket"),
        "user_id",
    ).distinct()


def warn_hot_cells(
    cells: DataFrame, frac: float = 0.2, sample_fraction: float = 0.001
) -> None:
    """Warn when a single (event_type, bucket) cell holds > ``frac`` of the
    membership rows — the cell self-join's degenerate-cartesian guard.

    A cell of size c contributes c*(c-1)/2 candidate pairs, so the hot
    cell's share of the JOIN work grows quadratically while its share of
    the INPUT grows linearly: one cell holding 20% of rows already owns
    ~80%+ of the pairs on an otherwise-uniform corpus, and a flash-crowd
    minute at 100 TB is a straggler task hours long.  Cost is bounded the
    same way as rangejoin._warn_degenerate_buckets: a seeded 1‰ sample
    census, exact only when the sample is too small to trust (input below
    ~10M rows — exact is cheap there), verdict cached per logical plan per
    process."""
    try:
        key = (cells.semanticHash(), frac, sample_fraction)
    except Exception:  # pragma: no cover - Connect/ancient Spark
        key = None
    if key is not None and key in _CELL_PROBE_SEEN:
        # LRU, not FIFO (ADVICE r11): a hit refreshes the entry's
        # position so hot plans never age out of the bounded dict.
        _CELL_PROBE_SEEN[key] = _CELL_PROBE_SEEN.pop(key)
        return
    members = cells.select("event_type", "bucket")
    sampled = members.sample(fraction=sample_fraction, seed=42)
    counts = sampled.groupBy("event_type", "bucket").count()
    row = counts.agg(F.sum("count").alias("n"), F.max("count").alias("mx")).first()
    if row is None or row["n"] is None or row["n"] < 10_000:
        row = (
            members.groupBy("event_type", "bucket")
            .count()
            .agg(F.sum("count").alias("n"), F.max("count").alias("mx"))
            .first()
        )
    if key is not None:
        while len(_CELL_PROBE_SEEN) >= _CELL_PROBE_SEEN_MAX:
            _CELL_PROBE_SEEN.pop(next(iter(_CELL_PROBE_SEEN)))
        _CELL_PROBE_SEEN[key] = None
    if row and row["n"] and row["mx"] / row["n"] > frac:
        est_pairs = row["mx"] * (row["mx"] - 1) // 2
        warnings.warn(
            f"cooccurrence_pairs: one (event_type, bucket) cell holds "
            f"{100.0 * row['mx'] / row['n']:.0f}% of membership rows "
            f"(> {100 * frac:.0f}%) — the cell self-join degenerates into a "
            f"~{est_pairs:,}-pair hot partition (quadratic in the cell). "
            f"Shrink the bucket, cap/salt the hot cell, or drop it (run the "
            f"b26_cooccurrence_skew_guard census to see the offenders).",
            RuntimeWarning,
            stacklevel=3,
        )


def cooccurrence_pairs(
    cells: DataFrame,
    directed: bool = False,
    skew_warn_frac: float | None = 0.2,
) -> DataFrame:
    """All co-occurring user pairs, one row per shared cell (callers
    ``.distinct()`` for an edge set or ``groupBy(ua, ub).count()`` for
    weights).  ``directed=False`` emits each pair once (ua < ub);
    ``directed=True`` emits both orientations (ua != ub).

    ``skew_warn_frac``: as in rangejoin.interval_join_bucketed — when not
    None the probe job(s) run EAGERLY at construction time (cached per
    plan); pass None when composing plans that may never execute."""
    if skew_warn_frac is not None:
        warn_hot_cells(cells, skew_warn_frac)
    node_cond = (
        F.col("a.user_id") != F.col("b.user_id")
        if directed
        else F.col("a.user_id") < F.col("b.user_id")
    )
    return (
        cells.alias("a")
        .join(
            cells.alias("b"),
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & node_cond,
        )
        .select(F.col("a.user_id").alias("ua"), F.col("b.user_id").alias("ub"))
    )


def cell_census(cells: DataFrame) -> DataFrame:
    """The EXACT per-cell census behind the sampled probe: one row per
    (event_type, bucket) with its membership count and the pair fan-out
    c*(c-1)/2 it would contribute to the self-join — the audit a pipeline
    runs before paying for the quadratic edge build.  One shuffle, one row
    per cell out (map-side combined)."""
    return (
        cells.groupBy("event_type", "bucket")
        .agg(F.count(F.lit(1)).alias("cell_rows"))
        .select(
            "event_type",
            "bucket",
            F.col("cell_rows").cast("bigint").alias("cell_rows"),
            F.expr("CAST(cell_rows * (cell_rows - 1) DIV 2 AS BIGINT)").alias(
                "pair_fanout"
            ),
        )
    )
