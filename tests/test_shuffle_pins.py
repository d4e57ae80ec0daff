"""Shuffle-count pins for the most expensive suite entries (VERDICT r13 #5).

Every Exchange in a plan is a full shuffle of its input — the scale
currency at 100 TB. The entries below are the top-10 priciest
plan-auditable entries by driver warm wall (BENCH_DETAIL.json, r13);
their current exchange counts are the RESULT of deliberate design
(banded LSH equi-joins instead of all-pairs, pre-partitioned CC edges,
shared skew-guarded graph edge builds, TakeOrdered feeder heaps), so a
future refactor that silently adds a shuffle should fail CI here — not
surface as a bench regression a round later.

Pins are `<=`: fewer shuffles is always acceptable. Counts are the
sf0.001 initial-plan shapes (AQE may coalesce at runtime but never adds
exchanges); broadcast-vs-sort-merge choices could differ at larger SFs,
which the bench covers — this gate is about plan-shape drift under
refactoring, pinned at the SF the test suite runs.
"""

from dataselector_spark.plans import shuffle_count
from dataselector_spark.suite import QUERIES

SF = "/root/testdata/sf0.001"

# entry -> max allowed Exchange nodes (hash/range/SinglePartition) in the
# executed-plan string at sf0.001. Measured 2026-08-16 (r14).
SHUFFLE_PINS = {
    "b16_image_dedup_survivors": 2,  # banded phash LSH join + CC rounds are
    # localCheckpointed inside fn(); the final plan joins survivors only
    "b13_kmv_source_similarity": 12,  # sketch build + 190-pair matrix +
    # exact twin audit, all over <=|sources|*k sketch rows
    "b26_triangle_count": 6,  # shared cooccurrence edge build + degree-
    # ordered orientation + one triangle-closing join
    "b16_phash256_neardup": 1,  # banded equi-join on (band, val)
    "b26_clustering_coeff": 6,  # same edge build; exact 3T/W division
    "b14_rrf_fusion_gain": 10,  # two TakeOrdered-20 feeder heaps + planted
    # relevance twins + fusion join + recall aggregation
    "b13_prefix_filter_pairs": 8,  # prefix-token inverted index + verify
    "b13_dedup_survivors": 5,  # MinHash bands + CC + anti-join survivors
    "b13_repeated_span_coverage": 4,  # positional shingles, one posexplode
    "b14_knn_accuracy_clustered": 2,  # IVF probe after bounded k-means
}


def test_pinned_entries_exist():
    stale = [n for n in SHUFFLE_PINS if n not in QUERIES]
    assert not stale, stale


def test_shuffle_counts_do_not_regress(spark):
    over = {}
    for name, pin in SHUFFLE_PINS.items():
        df = QUERIES[name].fn(spark, SF)
        n = shuffle_count(df)
        if n > pin:
            over[name] = (n, pin)
    assert not over, (
        f"entries now shuffle MORE than their pinned plan shape {over}; "
        "if the extra exchange is deliberate, re-justify the plan in the "
        "entry docstring and raise the pin in the same commit"
    )
