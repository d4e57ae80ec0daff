"""10x-replication scale ladder for the dedup/decontamination path.

Replicates sf0.1 documents 10x with SHIFTED doc_ids (each replica keeps the
same text, so every document gains 9 exact near-duplicates — a deliberately
duplication-heavy corpus, the worst case the fuzzy-dedup path must survive)
written as 32 parquet files, then times the B13/B15 entries on base vs 10x.

Usage: python tools/dedup_ladder.py   (writes /tmp/dedup_ladder_10x, prints
one timing line per op; results are recorded in docs/SCALE.md)
"""

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dataselector_spark.catalog import load_table
from dataselector_spark.session import get_spark
from dataselector_spark.suite import QUERIES

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TENX = "/tmp/dedup_ladder_10x"
OPS = [
    "b13_ngram_jaccard",
    "b13_minhash_lsh",
    "b13_dedup_survivors",
    "b13_dedup_pipeline_verified",
    "b13_incremental_dedup",
    "b15_decontaminate",
    "b15_rarity_score",
    "b22_global_shuffle",
]


def build_tenx(spark) -> None:
    if os.path.isdir(TENX):
        shutil.rmtree(TENX)
    os.makedirs(TENX)
    docs = load_table(spark, BASE, "documents")
    n = docs.agg(F.max("doc_id")).first()[0] + 1
    reps = None
    for i in range(10):
        r = docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * n))
        reps = r if reps is None else reps.unionByName(r)
    reps.repartition(32).write.mode("overwrite").parquet(
        os.path.join(TENX, "documents.parquet")
    )
    # embeddings unused by these ops but the loader may resolve paths lazily;
    # only documents is required.


def timeit(fn, *args):
    t = time.time()
    fn(*args).count()
    return round(time.time() - t, 2)


def main():
    spark = get_spark("dedup-ladder", cpus=32, shuffle_partitions=32)
    build_tenx(spark)
    print(f"{'op':28s} {'base_s':>8s} {'10x_s':>8s} {'ratio':>6s}")
    for name in OPS:
        fn = QUERIES[name].fn
        fn(spark, BASE).count()  # warm (JIT, file index)
        base = timeit(fn, spark, BASE)
        tenx = timeit(fn, spark, TENX)
        print(f"{name:28s} {base:8.2f} {tenx:8.2f} {tenx / base:6.2f}")


if __name__ == "__main__":
    main()
