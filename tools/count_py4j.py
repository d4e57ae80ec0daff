#!/usr/bin/env python
"""Count Py4J bridge commands per bench-entry BUILD (fn() -> DataFrame).

Splits each entry's build into COMMANDS (bridge round-trips — the driver-
side chatter the single-parse expression law removes) and WALL, so
chatter-heavy builds (high commands, wall ~ commands x ~0.3 ms) are
distinguishable from eager-work builds (localCheckpoint/stream runs: high
wall, few commands). Guide §1: measure before converting an entry.

Usage: python tools/count_py4j.py [set ...|all] [--reps N]
Writes /tmp/count_py4j.json and prints a table sorted by warm commands.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import py4j.java_gateway as _jg  # noqa: E402

_COUNTER = {"n": 0}
_orig_send = _jg.GatewayClient.send_command


def _counting_send(self, *args, **kwargs):
    _COUNTER["n"] += 1
    return _orig_send(self, *args, **kwargs)


_jg.GatewayClient.send_command = _counting_send

from dataselector_spark.session import get_spark  # noqa: E402
from dataselector_spark.suite import QUERIES  # noqa: E402

import bench  # noqa: E402


def main() -> None:
    argv = sys.argv[1:]
    reps = 2
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
        names = list(dict.fromkeys(n for key in bench.SETS for n in bench.SETS[key]))
    else:
        names = list(dict.fromkeys(n for key in sets for n in bench.SETS[key]))

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("count-py4j", cpus=cpus, shuffle_partitions=cpus)
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    out: dict[str, dict] = {}
    for name in names:
        fn = QUERIES[name].fn
        cmds, walls = [], []
        for _ in range(reps):
            n0 = _COUNTER["n"]
            t0 = time.perf_counter()
            fn(spark, sf_dir)
            walls.append(round(time.perf_counter() - t0, 3))
            cmds.append(_COUNTER["n"] - n0)
        out[name] = {
            "cmds": cmds,
            "build_wall": walls,
            "warm_cmds": min(cmds[1:]) if reps > 1 else cmds[0],
            "warm_wall": min(walls[1:]) if reps > 1 else walls[0],
        }
        print(f"{name:42s} cmds={cmds} wall={walls}", flush=True)

    with open("/tmp/count_py4j.json", "w") as f:
        json.dump(out, f, indent=1)

    print("\n== sorted by warm build commands ==")
    for name, d in sorted(out.items(), key=lambda kv: -kv[1]["warm_cmds"]):
        print(
            f"{name:42s} cmds={d['warm_cmds']:6d} wall={d['warm_wall']:7.3f}"
        )


if __name__ == "__main__":
    main()
