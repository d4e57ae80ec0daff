"""Named query suite — the driver-checkable contract (SURVEY.md §2).

Each entry pairs a PySpark callable `(spark, sf_dir) -> DataFrame` with an
equivalent ANSI-SQL oracle string for DuckDB (None → rows-only check for
genuinely non-SQL-expressible ops). `__spark_entry__.py` re-exports these.
"""

from .base import QUERIES, Query, query  # noqa: F401

# Importing registers every suite module's queries.
#
# Registration ORDER matters to the driver: its CORRECTNESS harness checks the
# first 50 entries in registration order.  Round 1 verified the first 50
# (reference_parity -> relational -> 4 window entries); those stay pinned by
# the local sf0.001 DuckDB oracle run (tests/test_suite_oracle.py).  Round 2
# therefore registers the previously-unchecked modules first so the driver's
# window lands on fresh surface: llm_pipeline (22) + streaming_suite (7) +
# tpch_full (11) + the first ~10 of extensions.
from . import llm_pipeline  # noqa: F401,E402
from . import streaming_suite  # noqa: F401,E402
from . import tpch_full  # noqa: F401,E402
from . import extensions  # noqa: F401,E402
from . import window_suite  # noqa: F401,E402
from . import reference_parity  # noqa: F401,E402
from . import relational  # noqa: F401,E402
from . import extras  # noqa: F401,E402

# Explicit window control: the driver's correctness harness checks the FIRST
# 50 registered entries each round.  Round 1 verified the reference_parity /
# relational / window_suite front; round 2 verified llm_pipeline +
# streaming_suite + tpch_full(part) + 10 promoted extensions entries.  The
# round-3 window below is exactly the 47 entries with no driver row in
# CORRECTNESS_r01/r02 plus the 3 re-checks (b15_lang_summary and
# b15_sequence_packing were red in r2 — oracle dtype, fixed in
# llm_pipeline.py; b06_approx_percentile crashed the r1 canonicalizer on an
# array column — schema flattened in r2, never re-run).
# tests/test_advice_fixes.py::test_driver_window_targets_unchecked_entries
# cross-checks this list against the CORRECTNESS_r*.json artifacts so a
# forgotten rotation fails CI instead of burning a driver round.
_R3_WINDOW = [
    # re-checks (previously red / crashed)
    "b15_lang_summary",
    "b15_sequence_packing",
    "b06_approx_percentile",
    # TPC-H analogues never driver-checked
    "q3_shipping_priority",
    "q4_order_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q10_returned_items",
    "q14_promo_revenue",
    "q17_small_quantity_revenue",
    "q18_large_volume_customer",
    "q19_discounted_revenue",
    # B6 aggregates tail
    "b06_pivot",
    "b06_unpivot",
    "b06_histogram",
    "b06_equidepth_histogram",
    "b06_percentiles",
    "b06_exact_distinct",
    "b06_sketch_rollup",
    # B8 window tail + B2/B5 extras
    "b08_outlier_zscore",
    "b08_sessionize",
    "b08_ratio_to_report",
    "b02_join_salted",
    "b05_asof_tolerance",
    "b01_json_permissive",
    # B22 data quality / sampling / curation
    "b22_quality_checks",
    "b22_stratified_sample",
    "b22_mixture_resample",
    "b22_mixture_upsample",
    "b22_train_val_split",
    "b22_global_shuffle",
    "b22_winsorize",
    "b22_drift_chisq",
    "b22_drift_ks",
    # B23 merge / CDC
    "b23_merge_upsert",
    "b23_apply_changelog",
    # B24 LLM corpus extras
    "b14_embedding_neardup_lsh",
    "b15_decontaminate",
    "b15_chunk_documents",
    "b15_repetition_score",
    "b15_rarity_score",
    # B16 real-numpy raster
    "b16_resize_nn",
    # B25/B26 time-series + behavioral
    "b25_gap_fill_interpolate",
    "b25_m4_downsample",
    "b25_time_weighted_avg",
    "b25_trend_per_series",
    "b26_funnel",
    "b26_retention_cohorts",
    "b26_transition_bigrams",
]
assert len(_R3_WINDOW) == 50, len(_R3_WINDOW)
_rest = [n for n in QUERIES if n not in _R3_WINDOW]
_order = _R3_WINDOW + _rest
_reordered = {n: QUERIES[n] for n in _order}
QUERIES.clear()
QUERIES.update(_reordered)


def queries():
    return {name: q.fn for name, q in QUERIES.items()}


def oracle_sql():
    return {name: q.oracle for name, q in QUERIES.items() if q.oracle is not None}
