"""Measured wall decomposition for b01_python_stream_source: the entry's
~5 s bench wall is claimed to be per-micro-batch streaming machinery
(StreamExecution start/commit cycles + a complete-mode aggregate per
batch), not data volume. This ladder varies the MICRO-BATCH COUNT at a
fixed 5000-row ledger (batch size = total / batches) and, as a control,
scales the ledger 10x at a fixed batch count — if the machinery claim
holds, wall grows with batch count and barely with rows.

Method: one full stream run per configuration (start -> process all ->
stop), single measurement (the effect is seconds-per-batch, far above
noise), fresh memory-sink table per run.

Usage: python tools/stream_source_ladder.py
Results recorded in docs/SCALE.md ("Python stream source ladder").
"""

import os
import sys
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dataselector_spark.session import get_spark

MULT, MOD = 2654435761, 1000003


def run_stream(spark, total, n_batches):
    from pyspark.sql.datasource import (
        DataSource,
        SimpleDataSourceStreamReader,
    )

    batch = max(1, total // n_batches)

    class LedgerStreamReader(SimpleDataSourceStreamReader):
        def initialOffset(self):
            return {"pos": 0}

        def read(self, start):
            pos = start["pos"]
            if pos >= total:
                return iter([]), {"pos": pos}
            end = min(pos + batch, total)
            rows = [
                (g, (g * MULT) % MOD, f"s{g % 7}") for g in range(pos, end)
            ]
            return iter(rows), {"pos": end}

        def readBetweenOffsets(self, start, end):
            return iter(
                (g, (g * MULT) % MOD, f"s{g % 7}")
                for g in range(start["pos"], end["pos"])
            )

    class LedgerSource(DataSource):
        @classmethod
        def name(cls):
            return f"dsspark_ladder_stream_{total}_{n_batches}"

        def schema(self):
            return "gid bigint, val bigint, tag string"

        def simpleStreamReader(self, schema):
            return LedgerStreamReader()

    spark.dataSource.register(LedgerSource)
    sdf = spark.readStream.format(LedgerSource.name()).load()
    name = f"ldr_{uuid.uuid4().hex[:12]}"
    t0 = time.perf_counter()
    q = (
        sdf.groupBy("tag")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("val").alias("val_sum"))
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    wall = time.perf_counter() - t0
    n = spark.table(name).agg(F.sum("n")).collect()[0][0]
    assert n == total, (n, total)
    return wall


def main():
    spark = get_spark("stream-source-ladder", cpus=8, shuffle_partitions=8)
    run_stream(spark, 5000, 4)  # warmup: first StreamExecution is costlier
    print(f"{'rows':>7} {'batches':>7} {'wall_s':>7}")
    for nb in (1, 2, 4, 8, 16):
        w = run_stream(spark, 5000, nb)
        print(f"{5000:>7} {nb:>7} {w:>7.2f}")
    for total in (50_000, 500_000):
        w = run_stream(spark, total, 4)
        print(f"{total:>7} {4:>7} {w:>7.2f}")
    spark.stop()


if __name__ == "__main__":
    main()
