#!/usr/bin/env python
"""Targeted DuckDB oracle check for named entries at one or more SF dirs —
the fast per-edit proof loop (the full differential sweep is
tools/full_differential.py).

Usage: python tools/oracle_spot.py name [name ...] [--sf d1,d2] [--cpus N]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"
    ),
)

from dataselector_spark.session import get_spark  # noqa: E402
from dataselector_spark.suite import QUERIES  # noqa: E402
from oracle_harness import compare  # noqa: E402


def main() -> None:
    argv = sys.argv[1:]
    sf_dirs = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
    cpus = 8
    names: list[str] = []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--sf":
            sf_dirs = argv[i + 1].split(",")
            i += 2
        elif a == "--cpus":
            cpus = int(argv[i + 1])
            i += 2
        else:
            names.append(a)
            i += 1
    spark = get_spark("oracle-spot", cpus=cpus, shuffle_partitions=cpus)
    failures = 0
    for sf_dir in sf_dirs:
        for name in names:
            q = QUERIES[name]
            if q.oracle is None:
                print(f"{sf_dir} {name}: SKIP (rows-only entry, no oracle)")
                continue
            t0 = time.time()
            ok, detail = compare(spark, sf_dir, q.fn, q.oracle)
            print(
                f"{sf_dir} {name}: {'OK' if ok else 'FAIL'} "
                f"({time.time() - t0:.1f}s) {detail if not ok else ''}",
                flush=True,
            )
            failures += 0 if ok else 1
    print(f"TOTAL failures: {failures}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
