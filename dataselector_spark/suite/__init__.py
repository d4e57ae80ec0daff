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

# The round-8 window (VERDICT r7 "Next round" #1 and #4):
#   * the 20 entries new in r7 that have never had a driver row (the red
#     tripwire's exact derivation — WAV/Y4M codecs, PQ/ADC/IVF+PQ family,
#     SCD2 incremental + lookup, partition-pruning pair, footer-stats agg,
#     NULL-semantics battery, dataset fingerprint, UDAF, recall report,
#     merge-schema, corrupt-file tolerance, MAD outlier, temperature
#     mixture, feature hashing, compaction readback);
#   * the 9 entries NEW in r8: exact heavy hitters, value-checked count-min
#     sketch, clustered-corpus IVF recall, runtime bloom-filter join,
#     incremental aggregate maintenance, aHash + pHash-256 image near-dup,
#     AQE runtime skew-join splitting, image-dedup survivors
#     (never-checked entries outrank re-confirms);
#   * 21 of the 36 oracle-bearing entries whose latest driver row is r4 —
#     post-regen (so not technically stale) but three rounds old (VERDICT
#     r7 #4: spend the free slots on the OLDEST rows, oldest first, and
#     never again on the rows-only-by-design approx entries).
# r9 queue, for the record: the 22 remaining r4-row entries
# (b06_exact_distinct, b14_embedding_neardup_lsh, b15_chunk_documents, b22_train_val_split, b22_global_shuffle, b15_repetition_score, b15_rarity_score, b01_json_permissive, b22_mixture_upsample,
# b22_drift_chisq, b22_drift_ks, b22_winsorize, b16_resize_nn,
# b26_transition_bigrams, b06_equidepth_histogram, plus b22_mixture_resample,
# b08_outlier_zscore, b23_apply_changelog, b23_merge_upsert,
# q14_promo_revenue, q10_returned_items and q7_volume_shipping — displaced
# from this window by the seven late-r8 additions
# b13_repeated_span_coverage / b13_prefix_filter_pairs / b21_map_in_arrow /
# b26_triangle_count / b15_pmi_collocations / b13_repeated_span_dedup /
# b06_nested_lineitems, which the tripwire ranks higher because they have
# never had a driver row) plus anything new in r8+.

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

_R8_WINDOW = [
    # --- 20 entries new in r7, never driver-checked (VERDICT r7 #1) ---
    "b16_wav_roundtrip",
    "b21_pandas_udaf_grouped_agg",
    "b14_ann_recall_report",
    "b16_y4m_roundtrip",
    "b23_scd2_incremental",
    "b22_compaction_readback",
    "b23_scd2_lookup",
    "b08_outlier_mad",
    "b01_parquet_merge_schema",
    "b01_partitioned_write_pruning",
    "b24_temperature_mixture",
    "b15_feature_hashing",
    "b14_pq_codes",
    "b14_pq_adc_topk",
    "b14_ivfpq_topk",
    "b01_ignore_corrupt_files",
    "b06_footer_stats_agg",
    "b02_dynamic_partition_pruning",
    "b11_null_semantics",
    "b22_dataset_fingerprint",
    # --- 9 entries new in r8 ---
    "b06_heavy_hitters_tokens",
    "b06_count_min_sketch",
    "b14_ivf_recall_clustered",
    "b02_bloom_filter_join",
    "b23_incremental_agg",
    "b16_ahash_neardup",
    "b16_phash256_neardup",
    "b02_aqe_skew_join",
    "b16_image_dedup_survivors",
    # --- 14 oldest re-confirms: driver rows from r4, oracle-bearing
    # (was 21; seven slots went to the late-r8 additions below) ---
    "b15_lang_summary",
    "b15_sequence_packing",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q17_small_quantity_revenue",
    "q18_large_volume_customer",
    "q19_discounted_revenue",
    "b22_quality_checks",
    "b06_histogram",
    "b06_percentiles",
    "b02_join_salted",
    "b06_unpivot",
    "q4_order_priority",
    # --- 7 late-r8 additions (never checked; outrank the 7 oldest
    # re-confirms they displaced, per the tripwire's priority rule) ---
    "b13_repeated_span_coverage",
    "b13_prefix_filter_pairs",
    "b21_map_in_arrow",
    "b26_triangle_count",
    "b15_pmi_collocations",
    "b13_repeated_span_dedup",
    "b06_nested_lineitems",
]
assert len(_R8_WINDOW) == 50, len(_R8_WINDOW)

# Import-time guard: every oracle may only reference driver-registered views
# or its own CTEs (base.check_oracle_tables) — a typo'd table name fails HERE,
# not in the driver's DuckDB run a round later.
from ..schemas import TABLE_SCHEMAS as _SCHEMAS  # noqa: E402

from .base import check_oracle_tables as _check_oracle_tables  # noqa: E402

_check_oracle_tables(QUERIES, set(_SCHEMAS))

_rest = [n for n in QUERIES if n not in _R8_WINDOW]
_order = _R8_WINDOW + _rest
_reordered = {n: QUERIES[n] for n in _order}
QUERIES.clear()
QUERIES.update(_reordered)


def queries():
    return {name: q.fn for name, q in QUERIES.items()}


def oracle_sql():
    return {name: q.oracle for name, q in QUERIES.items() if q.oracle is not None}
