"""Isolation re-run: time suite queries each in a FRESH JVM (one subprocess
per query), with bench.py's exact method (noop sink, median of warm reps,
sf0.1 local[32]).

Why this exists (VERDICT r7 'What's wrong' #2): the per-round bench runs 50+
queries through ONE long-lived JVM; r7 measured two outliers on code paths
with zero diffs (q21_waiting_supplier 3.49x, b13_minhash_lsh 2.85x) while
this round's standalone ladders put both at ~1.2 s — evidence of 54-query
session interference (GC / codegen-cache pressure), not plan regressions.
This tool produces the clean per-query number the gate math needs: same
timing method, zero co-tenants.

Usage: python tools/isolation_bench.py [query ...]
(defaults to the two r7 perf-weak queries; results recorded in docs/SCALE.md)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from dataselector_spark.session import get_spark
from dataselector_spark.suite import QUERIES

name = {name!r}
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
spark = get_spark("isolation-bench", cpus=cpus, shuffle_partitions=cpus)
spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warm-up

reps = max(2, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
runs = []
for _ in range(reps):
    t0 = time.perf_counter()
    QUERIES[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    runs.append(time.perf_counter() - t0)
warm = sorted(runs[1:])
mid = len(warm) // 2
median = warm[mid] if len(warm) % 2 else (warm[mid - 1] + warm[mid]) / 2
print("ISOLATION_RESULT " + json.dumps(
    {{"query": name, "isolated_sec": round(median, 3),
      "runs": [round(r, 3) for r in runs]}}))
"""


def main() -> None:
    names = sys.argv[1:] or ["q21_waiting_supplier", "b13_minhash_lsh"]
    results = []
    for name in names:
        code = _CHILD.format(repo=REPO, name=name)
        out = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True,
            text=True,
            cwd=REPO,
        )
        line = next(
            (l for l in out.stdout.splitlines() if l.startswith("ISOLATION_RESULT ")),
            None,
        )
        if line is None:
            print(f"{name}: FAILED\n{out.stderr[-2000:]}", file=sys.stderr)
            continue
        results.append(json.loads(line[len("ISOLATION_RESULT "):]))
    print(json.dumps({"metric": "isolation_rerun", "results": results}))


if __name__ == "__main__":
    main()
