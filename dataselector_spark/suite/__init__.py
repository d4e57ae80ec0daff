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
# 50 registered entries each round.  Rounds 1-3 covered the never-checked
# surface; round 4 repeated r3 by mistake; round 5 re-verified the r4 reds +
# the never-checked tail (50/50 green).  The round-6 window below (VERDICT r5
# "Next round" #1) = the 4 entries whose oracles were upgraded in r3 but whose
# only driver rows predate the upgrade (their rows still say no_oracle) + 5
# entries new this round (PPM codec, colocated interval join, repetition
# filter, z-order key, curation pipeline) + 41 re-confirms of entries last
# driver-checked in r1/r2, BEFORE the r4 testdata regeneration — prioritizing
# r1 greens, then the r2 fuzzy-dedup / multimodal / UDF / TPC-H surface.
# The 32 remaining stale entries are queued for the r7 window (VERDICT r5
# #2) — computed from the CORRECTNESS artifacts (latest driver round < 4,
# not in this window): a08/a09/a11/a13_insert/a17_compound/a18_forward/
# a27/a29, b01 parquet/csv/json/orc/text roundtrips, b02 left/right/full
# outer + lateral_topk, b03 semi/anti, b06_approx_distinct +
# b06_correlation_exact_moments, b10_multiset_ops, b12_dedup_composite_key,
# b13_minhash_lsh/b13_simhash (rows-only), b14_embedding_neardup,
# b15 text_stats/fingerprint/token_counts/tfidf_top_term, b16_frame_sample,
# q12 — 32 slots, leaving ~18 free for r7 additions/re-confirms.
# tests/test_advice_fixes.py::test_driver_window_targets_unchecked_entries
# derives the same priority classes from the CORRECTNESS_r*.json artifacts, so
# a forgotten rotation fails CI instead of burning a driver round.
_R6_WINDOW = [
    # oracles upgraded in r3, never driver-checked with them (rows say
    # no_oracle; the code now proves plane/centroid/arithmetic equality)
    "b14_ann_lsh",
    "b14_ann_ivf",
    "b15_lang_id_quality",
    "b16_multimodal_features",
    # new this round (never driver-checked): color PPM/P6 codec roundtrip,
    # write-once-bucketed zero-shuffle interval join
    "b16_ppm_roundtrip",
    "b04_interval_join_colocated",
    # re-confirms: last green r1, pre-regen
    "q1_pricing_summary",
    "b05_asof_join",
    "b04_interval_join_keyed",
    "b11_scalar_battery",
    "a19_group_count",
    "a20_distinct_sort",
    "a21_export",
    "a26_format_truncate",
    "b07_rollup",
    "b07_cube",
    "b07_grouping_sets",
    "b08_lag_lead",
    "b08_range_frame",
    "b08_rank_battery",
    "b08_rolling_frames",
    "b09_topk_global",
    "b09_topk_per_group",
    "b10_set_ops",
    # (b10_multiset_ops re-confirm displaced by the new repetition-filter
    # entry; B10 keeps the in-window twin b10_set_ops, multiset queued r7)
    "b15_repetition_filter",
    "b10_union_schema_evolution",
    "b02_join_revenue_per_nation",
    "b06_agg_battery",
    "b06_multires_rollup",
    # (b06_correlation_exact_moments queued for r7 — B6 keeps two in-window
    # twins above)
    # re-confirms: last green r2, pre-regen
    "b13_ngram_jaccard",
    "b13_dedup_clusters",
    "b13_dedup_survivors",
    "b14_topk_cosine",
    "b16_multimodal_meta",
    "b16_resize",
    # (b16_frame_sample re-confirm displaced by the new z-order entry; B16
    # keeps four in-window twins — meta, resize, features, ppm — frame
    # sample queued r7)
    "b22_zorder_key",
    "b21_pandas_udf_scalar",
    "b21_grouped_applyinpandas",
    "b21_python_udtf",
    "q2_min_cost_supplier",
    "q8_market_share",
    "q9_product_type_profit",
    "q11_important_parts",
    # (q12 re-confirm displaced by the end-to-end curation pipeline entry;
    # ten TPC-H analogues remain in-window, q12 queued r7)
    "b24_curation_pipeline",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q16_supplier_part_counts",
    "q20_part_promotion_suppliers",
    "q21_waiting_supplier",
    "q22_dormant_customers",
]
assert len(_R6_WINDOW) == 50, len(_R6_WINDOW)

# Import-time guard: every oracle may only reference driver-registered views
# or its own CTEs (base.check_oracle_tables) — a typo'd table name fails HERE,
# not in the driver's DuckDB run a round later.
from ..schemas import TABLE_SCHEMAS as _SCHEMAS  # noqa: E402

from .base import check_oracle_tables as _check_oracle_tables  # noqa: E402

_check_oracle_tables(QUERIES, set(_SCHEMAS))

_rest = [n for n in QUERIES if n not in _R6_WINDOW]
_order = _R6_WINDOW + _rest
_reordered = {n: QUERIES[n] for n in _order}
QUERIES.clear()
QUERIES.update(_reordered)


def queries():
    return {name: q.fn for name, q in QUERIES.items()}


def oracle_sql():
    return {name: q.oracle for name, q in QUERIES.items() if q.oracle is not None}
