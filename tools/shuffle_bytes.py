#!/usr/bin/env python
"""Measure TOTAL shuffle write/read bytes + records for named suite entries
via the Spark event log — the §2.3 'shuffle fewer bytes' evidence a local
wall clock can't show at sf0.1 (tiny shuffles are latency-bound, not
byte-bound; at 100 TB the bytes ARE the wall).

One fresh session per entry (so the log segments cleanly), one noop-sink
execution, then the JSON event log is parsed for SparkListenerTaskEnd
shuffle metrics.

Usage: python tools/shuffle_bytes.py name [name ...]
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dataselector_spark.session import get_spark  # noqa: E402
from dataselector_spark.suite import QUERIES  # noqa: E402


def one_entry(name: str, sf_dir: str, cpus: int) -> dict:
    log_dir = tempfile.mkdtemp(prefix=f"evlog_{name}_")
    spark = get_spark(
        f"shuffle-bytes-{name}",
        cpus=cpus,
        shuffle_partitions=cpus,
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": log_dir,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    try:
        df = QUERIES[name].fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
    finally:
        spark.stop()
    write_b = read_b = write_r = read_r = 0
    paths = []
    for path in glob.glob(os.path.join(log_dir, "*")):
        if os.path.isdir(path):  # rolling event-log dir (eventlog_v2_*)
            paths.extend(
                p
                for p in glob.glob(os.path.join(path, "*"))
                if os.path.isfile(p) and "appstatus" not in p
            )
        else:
            paths.append(path)
    for path in paths:
        with open(path) as f:
            for line in f:
                if '"SparkListenerTaskEnd"' not in line:
                    continue
                ev = json.loads(line)
                tm = ev.get("Task Metrics") or {}
                sw = tm.get("Shuffle Write Metrics") or {}
                sr = tm.get("Shuffle Read Metrics") or {}
                write_b += sw.get("Shuffle Bytes Written", 0)
                write_r += sw.get("Shuffle Records Written", 0)
                read_b += sr.get("Local Bytes Read", 0) + sr.get(
                    "Remote Bytes Read", 0
                )
                read_r += sr.get("Total Records Read", 0)
    shutil.rmtree(log_dir, ignore_errors=True)
    return {
        "shuffle_write_bytes": write_b,
        "shuffle_write_records": write_r,
        "shuffle_read_bytes": read_b,
        "shuffle_read_records": read_r,
    }


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    out = {}
    for name in names:
        out[name] = one_entry(name, sf_dir, cpus)
        m = out[name]
        print(
            f"{name:38s} write={m['shuffle_write_bytes']/1e6:9.2f} MB "
            f"({m['shuffle_write_records']} rows) "
            f"read={m['shuffle_read_bytes']/1e6:9.2f} MB",
            flush=True,
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
