"""Measured prefix-filter ladder: full inverted-index join vs prefix-filtered
join for the exact Jaccard >= 0.7 pair search, at growing corpus
replications.

b13_prefix_filter_pairs generates candidates from only the
(|S| - ceil(t*|S|) + 1) rarest-document-frequency shingles of each document
plus an exact size filter in the join condition; the full inverted index
(b13_ngram_jaccard's strategy) joins EVERY shingle posting. Both are exact,
so the interesting numbers are candidate-pair volume and wall as the corpus
grows — the prefix index is ~0.3|S|+1 postings per doc at t=0.7, and its
postings are by construction the LOW-df shingles, so its join keys are
anti-skewed while the full index's hottest keys grow with the corpus.

Each replication offsets doc_id per copy and prepends ONE (doc, copy)-unique
head token, so replicas are near-dup but not identical (the unique token
shifts two head shingles, J stays ~0.95) and per-shingle df grows
linearly with the replication — the realistic growth mode, not an injected
df=N hot key. Reports postings, candidate pairs, result pairs, and
median-of-3 warm walls for both strategies.

Usage: python tools/prefix_ladder.py [max_replication]
(r8 result at sf0.1, pair sets asserted equal at every rung:
 rep=1  5k docs: cand 1.13M vs 104k (10.8x fewer), wall 6.15 vs 2.21 s (2.78x)
 rep=2 10k docs: cand 4.53M vs 408k (11.1x),       wall 7.74 vs 3.80 s (2.04x)
 rep=4 20k docs: cand 18.1M vs 1.64M (11.0x),      wall 27.3 vs 5.75 s (4.75x)
— recorded in docs/SCALE.md)
"""

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dataselector_spark.catalog import load_table
from dataselector_spark.functions.text import word_ngrams
from dataselector_spark.session import get_spark

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM, DEN = 7, 10  # t = 0.7, exact integer arithmetic (see suite entry doc)


def replicated(spark, n):
    d = load_table(spark, BASE, "documents").select("doc_id", "text")
    if n > 1:
        copies = spark.range(n).select(F.col("id").alias("copy"))
        d = d.crossJoin(F.broadcast(copies)).select(
            (F.col("doc_id") + F.col("copy") * 1_000_000).alias("doc_id"),
            F.concat(
                F.lit("u"),
                (F.col("doc_id") * 100 + F.col("copy")).cast("string"),
                F.lit(" "),
                F.col("text"),
            ).alias("text"),
        )
    return d


def shingle_sets(d):
    sh = d.select(
        F.col("doc_id").alias("id"),
        F.explode(F.array_distinct(word_ngrams("text", 3))).alias("sh"),
    )
    df_rank = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
    per_doc = (
        sh.join(df_rank, "sh")
        .groupBy("id")
        .agg(F.sort_array(F.collect_list(F.struct("df", "sh"))).alias("arr"))
        .select(
            "id",
            F.col("arr.sh").alias("toks"),
            F.size("arr").cast("bigint").alias("sz"),
        )
    )
    return sh, per_doc


def verify(cand, per_doc):
    pa = per_doc.select(
        F.col("id").alias("id_a"),
        F.col("toks").alias("toks_a"),
        F.col("sz").alias("sz_a"),
    )
    pb = per_doc.select(
        F.col("id").alias("id_b"),
        F.col("toks").alias("toks_b"),
        F.col("sz").alias("sz_b"),
    )
    inter = F.size(F.array_intersect("toks_a", "toks_b")).cast("bigint")
    return (
        cand.join(pa, "id_a")
        .join(pb, "id_b")
        .select("id_a", "id_b", inter.alias("inter"), "sz_a", "sz_b")
        .filter(
            F.col("inter") * DEN
            >= (F.col("sz_a") + F.col("sz_b") - F.col("inter")) * NUM
        )
    )


def full_index_pairs(d):
    """The b13_ngram_jaccard strategy: every posting joins."""
    sh, per_doc = shingle_sets(d)
    cand = (
        sh.alias("a")
        .join(
            sh.alias("b"),
            (F.col("a.sh") == F.col("b.sh")) & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    return cand, verify(cand, per_doc)


def prefix_pairs(d):
    """The b13_prefix_filter_pairs strategy (same code shape as the entry)."""
    _, per_doc = shingle_sets(d)
    ceil_t_sz = (F.col("sz") * NUM + (DEN - 1)).cast("bigint") / DEN
    plen = (F.col("sz") - F.floor(ceil_t_sz) + 1).cast("int")
    pref = per_doc.select(
        "id", "sz", F.explode(F.slice("toks", F.lit(1), plen)).alias("sh")
    )
    cand = (
        pref.alias("a")
        .join(
            pref.alias("b"),
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.id") < F.col("b.id"))
            & (F.col("a.sz") * DEN >= F.col("b.sz") * NUM)
            & (F.col("b.sz") * DEN >= F.col("a.sz") * NUM),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    return cand, verify(cand, per_doc)


def wall(fn, reps=3):
    walls = []
    for _ in range(reps):
        t = time.time()
        fn()
        walls.append(time.time() - t)
    return statistics.median(walls)


def main():
    max_rep = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_spark("prefix-ladder", cpus=32, shuffle_partitions=32)
    rep = 1
    while rep <= max_rep:
        d = replicated(spark, rep).repartition(32).localCheckpoint()
        full_cand, full_res = full_index_pairs(d)
        pref_cand, pref_res = prefix_pairs(d)
        n_full_cand, n_pref_cand = full_cand.count(), pref_cand.count()
        n_full, n_pref = full_res.count(), pref_res.count()
        assert n_full == n_pref, (n_full, n_pref)  # exactness, every rung
        w_full = wall(lambda: full_res.count())
        w_pref = wall(lambda: pref_res.count())
        print(
            f"rep={rep} docs={d.count()} pairs={n_full} "
            f"cand full={n_full_cand} prefix={n_pref_cand} "
            f"({n_full_cand / max(n_pref_cand, 1):.1f}x fewer) "
            f"wall full={w_full:.2f}s prefix={w_pref:.2f}s "
            f"({w_full / w_pref:.2f}x)",
            flush=True,
        )
        rep *= 2
    spark.stop()


if __name__ == "__main__":
    main()
