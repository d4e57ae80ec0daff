"""Suite-wide bounded-unpartitioned-window gate (VERDICT r12 #2).

The r12 frame law killed the O(n^2) shrinking-frame class; this gate
mechanizes the remaining window hazard: a `Window.orderBy` with no
`partitionBy` collapses its entire input to ONE partition. Sixteen suite
sites use that shape deliberately — each over a relation argued bounded
(a <=65k-cell histogram, a top-k heap, a <=|strata| allocation) — but an
argument per site cannot stop entry #287 from shipping a corpus-scale
unpartitioned window unnoticed. So: walk every entry's physical plan,
find every WindowExec with an empty partitionSpec, and PROVE its input
bounded by structure (limit family / localCheckpointed RDD scan /
driver-literal relation), or — only for entries whitelisted by name in
`dataselector_spark.plans.BOUNDED_WINDOW_AGG_OK`, each with its stated
bound — by a bounded-key-domain aggregate.

First sweep of this gate (r13) caught two real scale bugs in green
entries: b06_equidepth_histogram ran ntile(10) over the raw events table
(rewritten onto operators/prefixsum.running_sums), and
b15_vocab_coverage ran rank/cumsum windows over the full vocabulary,
which scales with the corpus (rewritten onto a TakeOrdered-100 heap,
exploiting that a prefix sum at rank r only needs rows above r).

Effectful entries (streams, bucketed writes) are skipped here — their
plans are pinned by dedicated tests; global Sort nodes are NOT gated
(range-partitioned => distributed, and every final orderBy exists for
oracle parity).
"""

from dataselector_spark.plans import (
    BOUNDED_WINDOW_AGG_OK,
    EFFECTFUL_ENTRIES,
    unpartitioned_window_audit,
)
from dataselector_spark.suite import QUERIES

SF = "/root/testdata/sf0.001"


def test_every_unpartitioned_window_is_bounded(spark):
    failures = []
    for name, q in QUERIES.items():
        if name in EFFECTFUL_ENTRIES:
            continue
        try:
            df = q.fn(spark, SF)
            violations, _ = unpartitioned_window_audit(
                df, allow_aggregate=name in BOUNDED_WINDOW_AGG_OK
            )
        except Exception as ex:  # noqa: BLE001 — report, keep sweeping
            failures.append((name, f"EXC {ex}"[:200]))
            continue
        for v in violations:
            failures.append((name, v[:200]))
    assert not failures, "\n".join(f"{n}: {d}" for n, d in failures)


def test_whitelist_entries_exist():
    """A whitelisted name that no longer exists is stale — fail loudly so
    the whitelist shrinks with the suite instead of rotting."""
    stale = [n for n in BOUNDED_WINDOW_AGG_OK if n not in QUERIES]
    assert not stale, stale
