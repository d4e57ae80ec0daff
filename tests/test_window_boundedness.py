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
            wl = BOUNDED_WINDOW_AGG_OK.get(name)
            violations, _ = unpartitioned_window_audit(
                df, allowed_agg_keys=wl["keys"] if wl else None
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
    # every whitelist row must state its key names and its bound
    for n, wl in BOUNDED_WINDOW_AGG_OK.items():
        assert wl["keys"] and wl["bound"], n


def test_audit_rejects_aggregate_with_unlisted_keys(spark):
    """ADVICE r13: within a whitelisted entry, a keyed aggregate whose
    grouping keys are NOT the whitelisted names (e.g. a corpus-scale
    groupBy(doc_id)) must still violate — the trust is per-aggregate-key,
    not per-subtree."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from dataselector_spark.catalog import load_table

    d = load_table(spark, SF, "documents")
    per_doc = d.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    w = Window.orderBy("doc_id")
    df = per_doc.select("doc_id", F.row_number().over(w).alias("r"))
    # blanket trust of a different key name must NOT cover doc_id
    violations, _ = unpartitioned_window_audit(
        df, allowed_agg_keys=frozenset({"bucket"})
    )
    assert violations, "groupBy(doc_id) passed under a {'bucket'} whitelist"
    # the exact key name DOES cover it (the per-entry argument)
    violations, _ = unpartitioned_window_audit(
        df, allowed_agg_keys=frozenset({"doc_id"})
    )
    assert not violations, violations


def test_streaming_micro_batch_windows_bounded(spark):
    """VERDICT r13 #4: the batch gate skips EFFECTFUL_ENTRIES, so the
    streaming subset's micro-batch plans had no mechanical bounded-window
    proof. Every stream start/await site now records an audit of the last
    micro-batch's IncrementalExecution plan (plans.audit_streaming_query);
    this test drains each streaming entry and asserts (a) at least one
    audit was recorded — the hook is actually wired — and (b) every
    recorded audit is clean."""
    from dataselector_spark.plans import (
        STREAM_WINDOW_AUDITS,
        STREAMING_QUERY_ENTRIES,
    )

    failures = []
    for name in sorted(STREAMING_QUERY_ENTRIES):
        STREAM_WINDOW_AUDITS.clear()
        try:
            QUERIES[name].fn(spark, SF).collect()
        except Exception as ex:  # noqa: BLE001 — report, keep sweeping
            failures.append((name, f"EXC {ex}"[:200]))
            continue
        if not STREAM_WINDOW_AUDITS:
            failures.append((name, "no streaming audit recorded — hook missing"))
        for label, v in STREAM_WINDOW_AUDITS.items():
            for viol in v:
                failures.append((name, f"{label}: {viol[:160]}"))
    assert not failures, "\n".join(f"{n}: {d}" for n, d in failures)


def test_streaming_entry_set_tracks_effectful_names():
    """ADVICE r14 (strengthened from the 'stream'-substring heuristic,
    which a name like b20_state_store_read dodges): EFFECTFUL_ENTRIES is
    now DERIVED as STREAMING_QUERY_ENTRIES | BATCH_EFFECTFUL_ENTRIES, so
    an entry cannot reach the audit-skip set without being classified —
    this test pins the partition's hygiene."""
    from dataselector_spark.plans import (
        BATCH_EFFECTFUL_ENTRIES,
        EFFECTFUL_ENTRIES,
        STREAMING_QUERY_ENTRIES,
    )

    # the union IS the skip set (structural, but assert against drift back
    # to a hand-maintained literal)
    assert EFFECTFUL_ENTRIES == STREAMING_QUERY_ENTRIES | BATCH_EFFECTFUL_ENTRIES
    # disjoint: a streaming entry classified as batch-effectful would skip
    # the micro-batch window audit
    overlap = STREAMING_QUERY_ENTRIES & BATCH_EFFECTFUL_ENTRIES
    assert not overlap, overlap
    # name tripwire: batch-effectful names that LOOK streaming/stateful
    # are the likely misclassification — force an explicit excuse here
    suspicious = {
        n
        for n in BATCH_EFFECTFUL_ENTRIES
        if "stream" in n or "state" in n
    }
    assert not suspicious, (
        f"{suspicious} classified batch-effectful but named like streaming "
        "entries — move to STREAMING_QUERY_ENTRIES or excuse here"
    )
    # no rot: both sets must name real suite entries
    stale = EFFECTFUL_ENTRIES - set(QUERIES)
    assert not stale, stale


def test_audit_gates_window_in_pandas_exec(spark):
    """ADVICE r13: WindowInPandasExec (a pandas-UDF window function) must
    be gated exactly like WindowExec — class-name-prefix matching, not an
    exact-name check a variant node can slip past."""
    import pandas as pd
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    from dataselector_spark.catalog import load_table

    @pandas_udf("double")
    def pmean(v: pd.Series) -> float:
        return float(v.mean())

    e = load_table(spark, SF, "events").select("event_id", "value")
    w = Window.orderBy("event_id").rowsBetween(-2, 0)
    df = e.select("event_id", pmean("value").over(w).alias("m"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    # Spark 4 names the node ArrowWindowPythonExec (WindowInPandasExec in 3.x)
    assert "WindowPython" in plan or "WindowInPandas" in plan, plan[:1500]
    violations, _ = unpartitioned_window_audit(df)
    assert violations, "unpartitioned pandas-UDF window over a file scan passed"
