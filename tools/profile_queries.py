#!/usr/bin/env python
"""Per-query profiling for the optimization round: splits each bench entry's
wall into BUILD (Python fn() -> DataFrame: driver-side py4j chatter + any
eager work the entry does while constructing its plan) and EXEC (noop-sink
execution of the returned plan), with a cold and N warm reps of each.

Usage: python tools/profile_queries.py [set ...|all] [--reps N]
Writes /tmp/profile_queries.json and prints a sorted table.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dataselector_spark.session import get_spark  # noqa: E402
from dataselector_spark.suite import QUERIES  # noqa: E402

import bench  # noqa: E402


def main() -> None:
    # ADVICE r15 #5: accept both '--reps N' and '--reps=N' (the docstring
    # advertises the space form; it used to IndexError and leak 'N' into
    # the set names).
    argv = sys.argv[1:]
    reps = 3
    args: list[str] = []
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
            args.append(a)
            i += 1
    sets = args or ["all"]
    if sets == ["all"]:
        names = [n for key in bench.SETS for n in bench.SETS[key]]
    else:
        names = [n for key in sets for n in bench.SETS[key]]

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("profile-queries", cpus=cpus, shuffle_partitions=cpus)
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    out: dict[str, dict] = {}
    for name in names:
        fn = QUERIES[name].fn
        builds, execs = [], []
        for _ in range(reps):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            builds.append(round(t1 - t0, 3))
            execs.append(round(t2 - t1, 3))
        out[name] = {
            "build": builds,
            "exec": execs,
            "warm_build": round(min(builds[1:]), 3),
            "warm_exec": round(min(execs[1:]), 3),
            "warm_total": round(min(builds[1:]) + min(execs[1:]), 3),
        }
        print(
            f"{name:42s} build={builds} exec={execs}",
            flush=True,
        )

    with open("/tmp/profile_queries.json", "w") as f:
        json.dump(out, f, indent=1)

    print("\n== sorted by warm total (build + exec) ==")
    for name, d in sorted(out.items(), key=lambda kv: -kv[1]["warm_total"]):
        print(
            f"{name:42s} total={d['warm_total']:7.3f}"
            f" build={d['warm_build']:7.3f} exec={d['warm_exec']:7.3f}"
        )


if __name__ == "__main__":
    main()
