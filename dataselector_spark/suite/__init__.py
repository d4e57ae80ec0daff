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
# 50 registered entries each round.  History: r1-r3 covered the never-checked
# surface; r4 repeated r3 by mistake; r5 re-verified the r4 reds + the tail;
# r6 landed the oracle-upgraded + new entries and 41 pre-regen re-confirms
# (50/50 green).  The round-7 window below (VERDICT r6 "Next round" #1-2)
# closes the freshness ledger:
#   * 32 queued stale entries — every remaining entry whose latest driver row
#     predates the r4 testdata regeneration (the exact set the rotation
#     tripwire derives from the CORRECTNESS_r*.json artifacts);
#   * 6 entries whose IMPLEMENTATIONS were rewritten in r6 after their last
#     driver row (ADVICE r6 #3's "changed since last driver round" class,
#     now declared in REWRITTEN_IN_ROUND below so the tripwire enforces it):
#     b26_rolling_dau (single-scan reshape), b15_bpe_pair_counts (array
#     bind), b02_bucketed_join (ensure_bucketed_table migration),
#     b16_pgm_roundtrip (decode strictness), b15_decontaminate (word_ngrams
#     O(n^2) fix), b04_interval_join_bucketed (cached skew probe);
#   * 12 entries NEW in r7: nearest-direction as-of, normalized-text dedup,
#     per-domain token-budget cap, 3-D z-order key, z-order clustered-write
#     readback, streaming foreachBatch upsert sink, SCD Type-2 dimension
#     build, blocked edit-distance near-dup, zone-map manifest stats,
#     diversified top-k, exact-k per-cell sample, Dataset.observe metrics
#     (never-checked entries outrank re-confirms — the tripwire enforced
#     exactly this swap when the second six landed).
# After this round every entry's latest driver row is post-regen and
# post-rewrite — freshness debt zero.
# tests/test_advice_fixes.py::test_driver_window_targets_unchecked_entries
# derives the same priority classes from the CORRECTNESS_r*.json artifacts
# (and from REWRITTEN_IN_ROUND), so a forgotten rotation fails CI instead of
# burning a driver round.

# r8-queue note: every entry registered AFTER the 50-slot r7 window below is
# new in r7 and has never had a driver row — the rotation tripwire derives
# the exact set from the CORRECTNESS artifacts, but for the record the queue
# is (in registration order): b21_pandas_udaf_grouped_agg, b16_wav_roundtrip,
# b14_ann_recall_report, b16_y4m_roundtrip, b23_scd2_incremental,
# b22_compaction_readback, b23_scd2_lookup, b08_outlier_mad,
# b01_parquet_merge_schema, b01_partitioned_write_pruning,
# b24_temperature_mixture, b15_feature_hashing, b14_pq_codes,
# b14_pq_adc_topk, b14_ivfpq_topk, b01_ignore_corrupt_files,
# b06_footer_stats_agg, b02_dynamic_partition_pruning — plus the 6 second-
# batch r7 entries already pulled INTO the window. All are locally green at
# sf0.001+sf0.01 (this round's full differentials).

# Entries whose implementation changed materially in round N after their
# last driver row: the rotation tripwire treats a driver row older than the
# rewrite round as stale (ADVICE r6 #3). Add a line here whenever an
# already-green entry's code path is rewritten.
REWRITTEN_IN_ROUND = {
    "b26_rolling_dau": 6,
    "b15_bpe_pair_counts": 6,
    "b02_bucketed_join": 6,
    "b16_pgm_roundtrip": 6,
    "b15_decontaminate": 6,
    "b04_interval_join_bucketed": 6,
}

_R7_WINDOW = [
    # --- 32 queued stale entries (pre-regen driver rows), VERDICT r6 #1 ---
    "a08_round_to_step",
    "a09_clamp",
    "a11_affine_scale",
    "a13_selection_insert",
    "a17_retract_compound",
    "a18_forward_index",
    "a27_regex_replace",
    "a29_cross_join",
    "b01_parquet_roundtrip",
    "b01_csv_roundtrip",
    "b01_json_roundtrip",
    "b01_orc_roundtrip",
    "b01_text_roundtrip",
    "b02_join_left_outer",
    "b02_join_right_outer",
    "b02_join_full_outer",
    "b02_lateral_topk",
    "b03_semi_join",
    "b03_anti_join",
    "b06_approx_distinct",
    "b06_correlation_exact_moments",
    "b10_multiset_ops",
    "b12_dedup_composite_key",
    "b13_minhash_lsh",
    "b13_simhash",
    "b14_embedding_neardup",
    "b15_text_stats",
    "b15_fingerprint",
    "b15_token_counts",
    "b15_tfidf_top_term",
    "b16_frame_sample",
    "q12_late_shipment_priority",
    # --- 6 rewritten-in-r6 entries (REWRITTEN_IN_ROUND), ADVICE r6 #3 ---
    "b26_rolling_dau",
    "b15_bpe_pair_counts",
    "b02_bucketed_join",
    "b16_pgm_roundtrip",
    "b15_decontaminate",
    "b04_interval_join_bucketed",
    # --- 6 entries new in r7 ---
    "b05_asof_nearest",
    "b12_dedup_normalized_text",
    "b24_token_budget_cap",
    "b22_zorder_key_3d",
    "b22_zorder_write_readback",
    "b23_streaming_upsert_sink",
    # --- 6 more entries new in r7 (post-rotation batch) ---
    "b23_scd2_dimension",
    "b13_editdist_neardup",
    "b22_zone_map_stats",
    "b09_diversified_topk",
    "b22_cell_sample_exact_k",
    "b22_observe_metrics",
]
assert len(_R7_WINDOW) == 50, len(_R7_WINDOW)

# Import-time guard: every oracle may only reference driver-registered views
# or its own CTEs (base.check_oracle_tables) — a typo'd table name fails HERE,
# not in the driver's DuckDB run a round later.
from ..schemas import TABLE_SCHEMAS as _SCHEMAS  # noqa: E402

from .base import check_oracle_tables as _check_oracle_tables  # noqa: E402

_check_oracle_tables(QUERIES, set(_SCHEMAS))

_rest = [n for n in QUERIES if n not in _R7_WINDOW]
_order = _R7_WINDOW + _rest
_reordered = {n: QUERIES[n] for n in _order}
QUERIES.clear()
QUERIES.update(_reordered)


def queries():
    return {name: q.fn for name, q in QUERIES.items()}


def oracle_sql():
    return {name: q.oracle for name, q in QUERIES.items() if q.oracle is not None}
