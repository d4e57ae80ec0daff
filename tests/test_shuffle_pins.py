"""Shuffle-count pins for the expensive-tier suite entries (VERDICT r13 #5,
extended per VERDICT r14 #5/#6 to every plan-auditable entry whose best
isolated wall is >= 1.5 s, at BOTH sf0.001 and sf0.01).

Every Exchange in a plan is a full shuffle of its input — the scale
currency at 100 TB. The counts below are the RESULT of deliberate design
(banded LSH equi-joins instead of all-pairs, pre-partitioned CC edges,
shared skew-guarded graph edge builds, TakeOrdered feeder heaps), so a
future refactor that silently adds a shuffle should fail CI here — not
surface as a bench regression a round later.

Pins are `<=`: fewer shuffles is always acceptable. Counts are
initial-plan shapes (AQE may coalesce at runtime but never adds
exchanges). The sf0.01 column exists to catch broadcast-threshold drift:
a small-side relation that outgrows autoBroadcastJoinThreshold flips a
BroadcastHashJoin to a SortMergeJoin and ADDS two exchanges — invisible
at sf0.001, caught here at sf0.01 (r15 measurement: all 48 entries
currently plan identical counts at both SFs).

Tier membership is maintained by tools/measure_shuffle_pins.py (reads
BENCH_DETAIL.json, threshold 1.5 s, excludes EFFECTFUL_ENTRIES); re-run
it after a bench round and fold in any newly-expensive entry.
"""

import pytest

from dataselector_spark.plans import shuffle_count
from dataselector_spark.suite import QUERIES

SFS = ("sf0.001", "sf0.01")

# entry -> max allowed Exchange nodes (hash/range/SinglePartition) in the
# initial-plan string, per SF. Measured by tools/measure_shuffle_pins.py,
# 2026-08-16 (r15). Justifications: each entry's docstring carries the
# plan argument; one-line reminders here for the priciest shapes.
SHUFFLE_PINS = {
    # --- the original r14 top-10 (justifications unchanged) ---
    "b16_image_dedup_survivors": {"sf0.001": 2, "sf0.01": 2},  # banded
    # phash LSH join + CC rounds are localCheckpointed inside fn(); the
    # final plan joins survivors only
    "b13_kmv_source_similarity": {"sf0.001": 12, "sf0.01": 12},  # sketch
    # build + 190-pair matrix + exact twin audit over <=|sources|*k rows
    "b26_triangle_count": {"sf0.001": 6, "sf0.01": 6},  # shared
    # cooccurrence edge build + degree-ordered orientation + one
    # triangle-closing join
    "b16_phash256_neardup": {"sf0.001": 1, "sf0.01": 1},  # banded
    # equi-join on (band, val)
    "b26_clustering_coeff": {"sf0.001": 6, "sf0.01": 6},  # same edge
    # build; exact 3T/W division
    "b14_rrf_fusion_gain": {"sf0.001": 10, "sf0.01": 10},  # two
    # TakeOrdered-20 feeder heaps + planted relevance twins + fusion join
    "b13_prefix_filter_pairs": {"sf0.001": 8, "sf0.01": 8},  # prefix-token
    # inverted index + verify
    "b13_dedup_survivors": {"sf0.001": 5, "sf0.01": 5},  # MinHash bands +
    # CC + anti-join survivors
    "b13_repeated_span_coverage": {"sf0.001": 4, "sf0.01": 4},  # positional
    # shingles, one posexplode
    "b14_knn_accuracy_clustered": {"sf0.001": 2, "sf0.01": 2},  # IVF probe
    # after bounded k-means
    # --- r15 extension: the rest of the >=1.5 s tier ---
    "b14_mips_lsh": {"sf0.001": 1, "sf0.01": 1},  # bucket filter is a
    # map-side signature predicate; one TakeOrdered
    "b13_minhash_shard_merge": {"sf0.001": 2, "sf0.01": 2},
    "b13_incremental_ingest_dedup": {"sf0.001": 4, "sf0.01": 4},  # batch x
    # corpus band join only — corpus x corpus never formed
    "b13_ngram_jaccard": {"sf0.001": 11, "sf0.01": 11},  # shingle inverted
    # index with df-cap; pairs share >=1 shingle only
    "b26_pagerank_fixedpoint": {"sf0.001": 11, "sf0.01": 11},  # fixed
    # iteration count; one exchange per round over pre-keyed edges
    "b26_link_prediction_capped": {"sf0.001": 13, "sf0.01": 13},
    "b26_funnel_exclusion": {"sf0.001": 1, "sf0.01": 1},  # zero joins —
    # negation funnel rides one keyed aggregate
    "b14_knn_accuracy": {"sf0.001": 2, "sf0.01": 2},
    "b26_modularity": {"sf0.001": 9, "sf0.01": 9},
    "b13_record_linkage_planted": {"sf0.001": 2, "sf0.01": 2},
    "b13_leakage_safe_split": {"sf0.001": 7, "sf0.01": 7},
    "b14_ivfpq_topk": {"sf0.001": 0, "sf0.01": 0},  # map-only ADC scan +
    # TakeOrdered heap: ZERO shuffles by design
    "b26_communities_lpa": {"sf0.001": 0, "sf0.01": 0},  # checkpointed
    # label rounds inside fn(); final relation is pre-materialized
    "b13_repeated_span_dedup": {"sf0.001": 4, "sf0.01": 4},
    "b06_kmv_difference": {"sf0.001": 7, "sf0.01": 7},
    "b15_bm25_topk": {"sf0.001": 6, "sf0.01": 6},
    "b26_recursive_hierarchy": {"sf0.001": 2, "sf0.01": 2},
    "b14_rrf_hybrid": {"sf0.001": 5, "sf0.01": 5},
    "b06_quantile_refined": {"sf0.001": 19, "sf0.01": 19},  # two-level
    # sketch: per-partition partials + refinement passes, all <=256-row
    "b14_ivf_recall_clustered": {"sf0.001": 1, "sf0.01": 1},
    "b26_link_prediction": {"sf0.001": 8, "sf0.01": 8},
    "b15_surprisal_planted": {"sf0.001": 4, "sf0.01": 4},
    "b21_udtf_partitioned": {"sf0.001": 1, "sf0.01": 1},
    "b15_surprisal_tertiles": {"sf0.001": 4, "sf0.01": 4},
    "b13_source_overlap": {"sf0.001": 7, "sf0.01": 7},
    "b15_pmi_planted": {"sf0.001": 4, "sf0.01": 4},
    "b13_record_linkage": {"sf0.001": 0, "sf0.01": 0},  # broadcast dim
    # side + blocked comparators: zero exchanges
    "b16_ahash_neardup": {"sf0.001": 1, "sf0.01": 1},
    "b14_ann_recall_report": {"sf0.001": 1, "sf0.01": 1},
    "b26_assortativity": {"sf0.001": 9, "sf0.01": 9},
    "b06_kmv_intersect": {"sf0.001": 10, "sf0.01": 10},
    "b02_join_revenue_per_nation": {"sf0.001": 1, "sf0.01": 1},  # dims
    # broadcast; the one exchange is the final keyed aggregate
    "b14_pq_adc_topk": {"sf0.001": 0, "sf0.01": 0},  # map-only ADC
    "b26_sssp_bounded": {"sf0.001": 0, "sf0.01": 0},  # checkpointed
    # relaxation rounds inside fn()
    "b13_dedup_pipeline_verified": {"sf0.001": 3, "sf0.01": 3},
    "b26_bfs_levels": {"sf0.001": 37, "sf0.01": 37},  # bounded-depth
    # frontier expansion: ~4-5 exchanges per BFS round x 8 rounds; depth
    # is the pinned algorithm parameter, not data-dependent
    "b13_editdist_neardup": {"sf0.001": 0, "sf0.01": 0},  # length-banded
    # broadcast candidate join: zero exchanges
    "b26_kcore": {"sf0.001": 1, "sf0.01": 1},  # checkpointed peel rounds
    # inside fn()
}


def test_pinned_entries_exist():
    stale = [n for n in SHUFFLE_PINS if n not in QUERIES]
    assert not stale, stale


@pytest.mark.parametrize("sf", SFS)
def test_shuffle_counts_do_not_regress(spark, sf):
    over = {}
    for name, pins in SHUFFLE_PINS.items():
        df = QUERIES[name].fn(spark, f"/root/testdata/{sf}")
        n = shuffle_count(df)
        if n > pins[sf]:
            over[name] = (n, pins[sf])
    assert not over, (
        f"entries now shuffle MORE than their pinned plan shape at {sf}: "
        f"{over}; if the extra exchange is deliberate, re-justify the plan "
        "in the entry docstring and raise the pin in the same commit"
    )
