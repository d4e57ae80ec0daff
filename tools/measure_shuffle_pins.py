"""Measure Exchange counts for the expensive-tier suite entries at
sf0.001 AND sf0.01 (VERDICT r14 "Next round" #5/#6) — emits the pin
table pasted into tests/test_shuffle_pins.py.

Run:  python tools/measure_shuffle_pins.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dataselector_spark.plans import EFFECTFUL_ENTRIES, shuffle_count  # noqa: E402
from dataselector_spark.session import get_spark  # noqa: E402
from dataselector_spark.suite import QUERIES  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
THRESHOLD_S = 1.5


def expensive_tier() -> list[str]:
    """Plan-auditable entries whose best isolated per-query wall in the
    committed BENCH_DETAIL.json is >= THRESHOLD_S, costliest first."""
    with open(os.path.join(REPO, "BENCH_DETAIL.json")) as f:
        detail = json.load(f)
    cost: dict[str, float] = {}
    for set_info in detail.get("isolated", {}).values():
        for q, t in set_info.get("queries", {}).items():
            cost[q] = min(t, cost.get(q, 1e9))
    names = [
        q
        for q, t in sorted(cost.items(), key=lambda kv: -kv[1])
        if t >= THRESHOLD_S and q in QUERIES and q not in EFFECTFUL_ENTRIES
    ]
    return names


def main() -> None:
    spark = get_spark("measure-shuffle-pins", cpus=8, shuffle_partitions=8)
    rows = []
    for name in expensive_tier():
        counts = {}
        for sf in ("sf0.001", "sf0.01"):
            try:
                df = QUERIES[name].fn(spark, f"/root/testdata/{sf}")
                counts[sf] = shuffle_count(df)
            except Exception as ex:  # noqa: BLE001 — report, keep sweeping
                counts[sf] = f"EXC {ex}"[:120]
        rows.append((name, counts))
        print(f"{name:40s} {counts['sf0.001']!r:>6} {counts['sf0.01']!r:>6}",
              flush=True)
    print("\n# paste-ready table:")
    for name, counts in rows:
        print(f'    "{name}": {{"sf0.001": {counts["sf0.001"]!r}, '
              f'"sf0.01": {counts["sf0.01"]!r}}},')


if __name__ == "__main__":
    main()
