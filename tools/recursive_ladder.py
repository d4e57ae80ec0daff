"""Measured depth/size scaling for Spark 4's recursive CTE (UnionLoop),
backing b26_recursive_hierarchy's scale notes.

The hierarchy shape is the entry's (parent = id DIV 10, roots id < 10),
run over spark.range(N) so the ladder isolates UnionLoop mechanics from
file I/O. N x10 adds exactly one recursion level (depth = digit count),
so the ladder separates the two scale variables the SCALE.md note warns
about: total closure size (every node appears exactly once, at its own
chain depth -> closure_rows = N, printed as a check) and level COUNT
(one frontier join + union each, fixed per-level overhead).

Bench method: single run per rung after one discarded warmup query
(the signal is the trend).

Usage: python tools/recursive_ladder.py [max_exp]   (default 7 -> 1e7)
Results recorded in docs/SCALE.md ("Recursive CTE ladder").
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dataselector_spark.session import get_spark


def main():
    max_exp = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    spark = get_spark("recursive-ladder", cpus=8, shuffle_partitions=8)
    # Second runaway guard found by this ladder: besides the LEVEL limit
    # (spark.sql.cteRecursionLevelLimit = 100), UnionLoop enforces a
    # TOTAL-ROWS-EMITTED limit (spark.sql.cteRecursionRowLimit, default
    # 1e6) and fails with RECURSION_ROW_LIMIT_EXCEEDED at N = 1e6 —
    # raise it for the big rungs, and size it deliberately in production.
    spark.conf.set("spark.sql.cteRecursionRowLimit", str(10**9))
    spark.range(100).createOrReplaceTempView("rl_nodes")
    spark.sql(
        "WITH RECURSIVE w AS (SELECT id AS node FROM rl_nodes WHERE id < 10"
        " UNION ALL SELECT t.id FROM rl_nodes t JOIN w ON t.id DIV 10 ="
        " w.node WHERE t.id >= 10) SELECT count(*) FROM w"
    ).collect()  # warmup: codegen + UnionLoop machinery first-touch
    print(f"{'N':>10} {'depth':>5} {'closure_rows':>12} {'wall_s':>7}")
    for exp in range(4, max_exp + 1):
        n = 10**exp
        spark.range(n).createOrReplaceTempView("rl_nodes")
        t0 = time.perf_counter()
        df = spark.sql("""
            WITH RECURSIVE chain AS (
                SELECT id AS node, id AS root, 0 AS depth
                FROM rl_nodes WHERE id < 10
                UNION ALL
                SELECT t.id, ch.root, ch.depth + 1
                FROM rl_nodes t JOIN chain ch ON t.id DIV 10 = ch.node
                WHERE t.id >= 10
            )
            SELECT depth, count(*) AS n FROM chain GROUP BY depth
        """)
        rows = df.collect()
        wall = time.perf_counter() - t0
        depth = max(r["depth"] for r in rows)
        total = sum(r["n"] for r in rows)
        print(f"{n:>10} {depth:>5} {total:>12} {wall:>7.2f}")
    spark.stop()


if __name__ == "__main__":
    main()
