"""Hot-cell skew guard for the shared co-occurrence edge build
(operators/graph.py — VERDICT r9 "Next round" #2).

The failure mode: one flash-crowd (event_type, bucket) cell turns the cell
self-join quadratic on that cell (c users -> c*(c-1)/2 pairs in ONE
partition). The guard is the rangejoin degenerate-bucket probe ported to
the cell axis; these tests plant the pathology and pin both the warning
and the census arithmetic.
"""

import warnings

import pytest
from pyspark.sql import functions as F


def _cells(spark, rows):
    return spark.createDataFrame(rows, "event_type string, bucket long, user_id long")


def test_warn_hot_cells_fires_on_planted_flash_crowd(spark):
    """One bucket holding 10^3 users (vs a sparse background) must warn —
    the r4 corrupted-timestamp incident class, caught before the join."""
    from dataselector_spark.operators.graph import cooccurrence_pairs

    hot = [("click", 1, u) for u in range(1000)]
    background = [("view", 100 + u, u) for u in range(50)]
    g = _cells(spark, hot + background)
    with pytest.warns(RuntimeWarning, match="hot partition"):
        cooccurrence_pairs(g, skew_warn_frac=0.2)


def test_warn_hot_cells_quiet_on_uniform_cells(spark):
    """A uniform distribution must NOT warn (and the pairs must be right)."""
    from dataselector_spark.operators.graph import cooccurrence_pairs

    rows = [("click", b, u) for b in range(20) for u in range(5)]
    g = _cells(spark, rows)
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        pairs = cooccurrence_pairs(g, skew_warn_frac=0.2)
        # 20 cells x C(5,2) = 200 undirected pair rows
        assert pairs.count() == 20 * 10


def test_probe_verdict_cached_per_plan(spark):
    """Repeated construction over the same input probes once (the
    rangejoin _SKEW_PROBE_SEEN contract: bench reps pay one probe)."""
    from dataselector_spark.operators import graph

    hot = [("click", 1, u) for u in range(200)]
    g = _cells(spark, hot)
    before = len(graph._CELL_PROBE_SEEN)
    with pytest.warns(RuntimeWarning):
        graph.cooccurrence_pairs(g, skew_warn_frac=0.2)
    assert len(graph._CELL_PROBE_SEEN) == before + 1
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)  # cached -> no re-warn
        graph.cooccurrence_pairs(g, skew_warn_frac=0.2)
    assert len(graph._CELL_PROBE_SEEN) == before + 1


def test_probe_cache_keys_on_sample_fraction_and_is_bounded(spark):
    """ADVICE r10: the probe-verdict cache key must include EVERY probe
    parameter — a re-probe at a different sample_fraction is a different
    probe, not a cache hit — and the set must stay bounded so a long-lived
    process composing many distinct plans cannot grow it without limit."""
    from dataselector_spark.operators import graph

    hot = [("click", 1, u) for u in range(200)]
    g = _cells(spark, hot)
    with pytest.warns(RuntimeWarning):
        graph.warn_hot_cells(g, frac=0.2, sample_fraction=0.001)
    before = len(graph._CELL_PROBE_SEEN)
    # Same plan, DIFFERENT sample_fraction: must probe (and warn) again.
    with pytest.warns(RuntimeWarning):
        graph.warn_hot_cells(g, frac=0.2, sample_fraction=0.5)
    assert len(graph._CELL_PROBE_SEEN) == before + 1
    # Bounded: a full cache evicts its oldest entry on the next insert
    # (warn_hot_cells' own eviction path, not a test-local reimplementation).
    old_max, old_seen = graph._CELL_PROBE_SEEN_MAX, dict(graph._CELL_PROBE_SEEN)
    graph._CELL_PROBE_SEEN.clear()
    graph._CELL_PROBE_SEEN_MAX = 4
    try:
        for i in range(4):
            graph._CELL_PROBE_SEEN[(i, 0.0, float(i))] = None
        oldest = next(iter(graph._CELL_PROBE_SEEN))
        with pytest.warns(RuntimeWarning):
            graph.warn_hot_cells(g, frac=0.2, sample_fraction=0.25)
        assert len(graph._CELL_PROBE_SEEN) == 4
        assert oldest not in graph._CELL_PROBE_SEEN
    finally:
        graph._CELL_PROBE_SEEN_MAX = old_max
        graph._CELL_PROBE_SEEN.clear()
        graph._CELL_PROBE_SEEN.update(old_seen)


def test_probe_cache_hit_refreshes_lru_position(spark):
    """ADVICE r11: the bounded cache must be LRU, not FIFO — a cache HIT
    moves the key to the back of the eviction order, so a long-lived
    process cycling through >max plans never re-pays probe jobs for keys
    that are still hot."""
    from dataselector_spark.operators import graph

    hot = [("click", 1, u) for u in range(200)]
    g = _cells(spark, hot)
    # Prime the real key via the production path.
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        graph.warn_hot_cells(g, frac=0.2, sample_fraction=0.25)
    real_key = [k for k in graph._CELL_PROBE_SEEN if k[1] == 0.2][-1]
    old_max, old_seen = graph._CELL_PROBE_SEEN_MAX, dict(graph._CELL_PROBE_SEEN)
    graph._CELL_PROBE_SEEN.clear()
    graph._CELL_PROBE_SEEN_MAX = 4
    try:
        # real_key is OLDEST, then three synthetic fillers.
        graph._CELL_PROBE_SEEN[real_key] = None
        for i in range(3):
            graph._CELL_PROBE_SEEN[(i, 0.0, float(i))] = None
        # A HIT on real_key must refresh it to the back...
        with warnings.catch_warnings():
            warnings.simplefilter("error", RuntimeWarning)  # cached, no probe
            graph.warn_hot_cells(g, frac=0.2, sample_fraction=0.25)
        assert next(iter(graph._CELL_PROBE_SEEN)) == (0, 0.0, 0.0)
        # ...so the next insert evicts the synthetic filler, not real_key.
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", RuntimeWarning)
            graph.warn_hot_cells(g, frac=0.2, sample_fraction=0.125)
        assert real_key in graph._CELL_PROBE_SEEN
        assert (0, 0.0, 0.0) not in graph._CELL_PROBE_SEEN
    finally:
        graph._CELL_PROBE_SEEN_MAX = old_max
        graph._CELL_PROBE_SEEN.clear()
        graph._CELL_PROBE_SEEN.update(old_seen)


def test_cell_census_pair_fanout_arithmetic(spark):
    """census pair_fanout must be exactly c*(c-1)/2 per cell."""
    from dataselector_spark.operators.graph import cell_census

    rows = (
        [("click", 1, u) for u in range(7)]
        + [("view", 1, u) for u in range(3)]
        + [("view", 2, 99)]
    )
    got = {
        (r["event_type"], r["bucket"]): (r["cell_rows"], r["pair_fanout"])
        for r in cell_census(_cells(spark, rows)).collect()
    }
    assert got == {
        ("click", 1): (7, 21),
        ("view", 1): (3, 3),
        ("view", 2): (1, 0),
    }


def test_graph_entries_share_the_guarded_build(spark):
    """The seven B26 graph entries must all route their edge build through
    operators/graph.py (the point of VERDICT r9 #2: one audited entry
    point, not seven hand-rolled joins)."""
    import inspect

    from dataselector_spark.suite import QUERIES

    for name in (
        "b26_triangle_count",
        "b26_clustering_coeff",
        "b26_pagerank_fixedpoint",
        "b26_bfs_levels",
        "b26_kcore",
        "b26_sssp_bounded",
        "b26_assortativity",
    ):
        src = inspect.getsource(QUERIES[name].fn)
        assert "cooccurrence_pairs" in src, name
