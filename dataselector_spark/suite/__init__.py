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
# streaming_suite + tpch_full(part) + 10 promoted extensions entries; round 3
# verified the remaining never-checked tail; round 4 (by mistake) repeated
# round 3's window.  The round-5 window below = the 10 entries red in
# CORRECTNESS_r04 (all casualties of the events-timestamp-unit bug fixed in
# catalog.py — VERDICT r4 "What's wrong" #1) + the 8 entries that have never
# had a driver row + 32 re-confirms prioritizing everything events-dependent
# that was last green in r1/r2 BEFORE the testdata regen (streaming b17-b20,
# the reference-parity core, b04/b05/b11/b12, flagship).
# tests/test_advice_fixes.py::test_driver_window_targets_unchecked_entries
# cross-checks this list against the CORRECTNESS_r*.json artifacts so a
# forgotten rotation fails CI instead of burning a driver round.
_R5_WINDOW = [
    # the 10 entries red in r4 (events ts-unit bug, fixed in catalog.py)
    "b06_pivot",
    "b08_sessionize",
    "b08_ratio_to_report",
    "b05_asof_tolerance",
    "b25_gap_fill_interpolate",
    "b25_m4_downsample",
    "b25_time_weighted_avg",
    "b25_trend_per_series",
    "b26_funnel",
    "b26_retention_cohorts",
    # the 8 entries never driver-checked
    "b01_orc_roundtrip_lineitem",
    "b13_minhash_portable",
    "b13_simhash_portable",
    "b13_dedup_pipeline_verified",
    "b13_incremental_dedup",
    "b13_dedup_survivors_quality",
    "b15_bpe_pair_counts",
    "b22_stratified_sample_hash",
    # re-confirms: streaming (last green r2, events-dependent)
    "b17_stream_tumbling",
    "b17_stream_sliding",
    "b18_stream_session",
    "b19_stream_watermark",
    "b20_stream_dedup",
    "b20_stream_toggle",
    "b20_stream_stream_join",
    # re-confirms: reference-parity core (last green r1, events-dependent)
    "a04_derived_timestamp",
    "a05_range_filter",
    "a06_box_select_pixel",
    "a07_extents",
    "a13_selection_toggle",
    "a15_composite_key",
    "a16_semi_join_apply",
    "a17_anti_join_retract",
    "a18_inverted_index",
    "a22_having",
    "flagship_minute_flag_counts",
    # re-confirms: other events-dependent entries last green r1/r2
    "b12_dedup_exact",
    "b04_interval_join_bucketed",
    "b17_stream_static_enrich",
    # new this round (never driver-checked): PGM codec, embedding dedup
    # survivors, PII scrub, bucketed co-located join. (Displaced re-confirms
    # b04_interval_join_keyed / b11_scalar_battery / b02_join_full_outer stay
    # covered by the local sf0.001/sf0.01 oracle runs in CI.)
    "b16_pgm_roundtrip",
    "b14_embedding_dedup_survivors",
    "b15_pii_scrub",
    "b02_bucketed_join",
    # (a13_selection_insert / a17_retract_compound re-confirms displaced by
    # the XML + binary-ingest entries; their op ids stay covered in-window
    # by a13_selection_toggle / a17_anti_join_retract and by CI oracles)
    "b01_xml_roundtrip",
    "b16_binary_ingest",
    # (a18_forward_index / a19_group_count / b12_dedup_composite_key
    # re-confirms displaced by the containment / vocab-coverage / rolling-DAU
    # entries; each displaced op id keeps an in-window twin: a18_inverted_index,
    # a22_having, b12_dedup_exact)
    "b13_containment_pairs",
    "b15_vocab_coverage",
    "b26_rolling_dau",
    # (a21_export / a26_format_truncate re-confirms displaced by the profile
    # and snapshot-diff entries; both ops stay pytest- and CI-oracle-covered)
    "b22_table_profile",
    "b23_snapshot_diff",
]
assert len(_R5_WINDOW) == 50, len(_R5_WINDOW)

# Import-time guard: every oracle may only reference driver-registered views
# or its own CTEs (base.check_oracle_tables) — a typo'd table name fails HERE,
# not in the driver's DuckDB run a round later.
from ..schemas import TABLE_SCHEMAS as _SCHEMAS  # noqa: E402

from .base import check_oracle_tables as _check_oracle_tables  # noqa: E402

_check_oracle_tables(QUERIES, set(_SCHEMAS))

_rest = [n for n in QUERIES if n not in _R5_WINDOW]
_order = _R5_WINDOW + _rest
_reordered = {n: QUERIES[n] for n in _order}
QUERIES.clear()
QUERIES.update(_reordered)


def queries():
    return {name: q.fn for name, q in QUERIES.items()}


def oracle_sql():
    return {name: q.oracle for name, q in QUERIES.items() if q.oracle is not None}
