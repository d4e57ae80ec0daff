#!/usr/bin/env python
"""Time NAMED suite entries bench-identically (fresh session, noop sink,
median-of-warm) — the targeted A/B runner for single-entry experiments
where a whole frozen set would drown the signal in neighbors.

Usage: python tools/time_entries.py name [name ...] [--reps N]
Prints one JSON line: {"queries": {...}, "cpu_probe_s": ..., ...}.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dataselector_spark.session import get_spark  # noqa: E402

import bench  # noqa: E402


def main() -> None:
    argv = sys.argv[1:]
    reps = 3
    names: list[str] = []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--reps":
            reps = int(argv[i + 1])
            i += 2
        elif a.startswith("--reps="):
            reps = int(a.split("=", 1)[1])
            i += 1
        else:
            names.append(a)
            i += 1
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("time-entries", cpus=cpus, shuffle_partitions=cpus)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    timings = bench._time_queries(spark, names, sf_dir, reps)
    print(
        json.dumps(
            {
                "queries": timings,
                "wall": round(sum(timings.values()), 3),
                "cpu_probe_s": bench._cpu_probe(),
                "cpu_probe_multi_s": bench._cpu_probe_multi(),
                "reps": reps,
            }
        )
    )


if __name__ == "__main__":
    main()
