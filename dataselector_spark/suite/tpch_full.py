"""The remaining TPC-H analogues (Q2, Q8, Q9, Q11, Q12, Q13, Q15, Q16, Q20,
Q21, Q22), completing the 22-query headline set started in extensions.py.

The driver's star schema is a reduced TPC-H (TESTDATA.md): no ``partsupp``,
no commit/receipt dates, no phone/comment columns.  Each query below keeps
the *shape* of its TPC-H namesake — the operator composition Catalyst has to
plan — and substitutes available columns for missing ones:

- part↔supplier linkage (Q2/Q11/Q16/Q20) rides ``lineitem`` (l_partkey,
  l_suppkey) instead of ``partsupp``; "supply cost" is min(l_extendedprice),
  "stock value" is sum(extendedprice*quantity) over shipped lines.
- "late" (Q12/Q21) is l_shipdate > o_orderdate + fixed interval, standing in
  for receiptdate>commitdate.
- Q22's "7-year dormant customer" is an anti-join against orders after
  1999-01-01 (every customer here has *some* order, so plain NOT EXISTS
  would be vacuously empty — see memory of data domains).

Float policy is relational.py's: exact DECIMAL accumulation, cast to DOUBLE
only at the edge; ratios/averages are computed as double÷double with the
identical expression in both engines (IEEE ops are deterministic); decimal
equality (Q2's min-cost match, Q15's max-revenue match) is exact, so
equality predicates on aggregates are hash-safe.

Scale notes (100 TB posture): every query shuffles facts at most once per
join key, dims (supplier/nation/region/part-filtered) are broadcast, scalar
subqueries (Q11 total, Q15 max) reduce to one row before the crossJoin so
they broadcast trivially, and the Q2/Q15 "argmin/argmax by group" pattern is
a window over the already-aggregated (small) relation, not the fact table.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..catalog import load_table
from .base import query
from .base import dec2


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


def _revenue():
    return dec2("l_extendedprice") * dec2(F.lit(1) - F.col("l_discount"), 4)


@query(
    "q2_min_cost_supplier",
    oracle="""
    WITH offers AS (
      SELECT l_partkey AS partkey, l_suppkey AS suppkey,
             min(CAST(l_extendedprice AS DECIMAL(12,2))) AS cost
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
      GROUP BY 1, 2
    )
    SELECT s_acctbal, s_name, n_name, p_partkey,
           CAST(cost AS DOUBLE) AS supplycost
    FROM offers
    JOIN part     ON partkey = p_partkey
    JOIN supplier ON suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_size = 15
      AND cost = (SELECT min(cost) FROM offers o2 WHERE o2.partkey = offers.partkey)
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    """,
    doc="TPC-H Q2 analogue: cheapest EUROPE supplier per size-15 part, the "
    "partsupp role played by observed lineitem prices. The correlated "
    "min() becomes a window over the pre-aggregated offers relation "
    "(tiny), never a re-scan of the fact table; decimal min-equality is "
    "exact so the predicate is hash-safe.",
)
def q2_min_cost_supplier(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = _t(spark, sf_dir, "part").filter(F.col("p_size") == 15)
    offers = (
        l.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(
            F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey")
        )
        .agg(F.min(dec2("l_extendedprice")).alias("cost"))
    )
    best = offers.withColumn(
        "min_cost", F.min("cost").over(Window.partitionBy("partkey"))
    ).filter(F.col("cost") == F.col("min_cost"))
    return (
        best.join(F.broadcast(p), F.col("partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            F.col("cost").cast("double").alias("supplycost"),
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
    )


@query(
    "q8_market_share",
    oracle="""
    WITH vol AS (
      SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
             CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2)) AS volume,
             n2.n_name AS supp_nation
      FROM lineitem
      JOIN part     ON l_partkey = p_partkey
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region   ON n1.n_regionkey = r_regionkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'ASIA' AND p_type = 'PROMO'
        AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1999-01-01 00:00:00'
    )
    SELECT o_year,
           CAST(sum(CASE WHEN supp_nation = 'NATION_7' THEN volume END) AS DOUBLE)
             / CAST(sum(volume) AS DOUBLE) AS mkt_share
    FROM vol GROUP BY o_year ORDER BY o_year
    """,
    doc="TPC-H Q8 analogue: NATION_7's share of PROMO-part revenue sold into "
    "ASIA, by order year. nation appears twice (customer side and supplier "
    "side) — both broadcast; numerator/denominator are exact decimal sums "
    "divided as doubles with the identical expression in both engines. "
    "A year with no NATION_7 sales yields NULL/NULL-safe 0 via sum-of-"
    "nothing = NULL, matching DuckDB (CASE with no ELSE).",
)
def q8_market_share(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01 00:00:00")
        & (F.col("o_orderdate") < "1999-01-01 00:00:00")
    )
    c = _t(spark, sf_dir, "customer")
    n1 = _t(spark, sf_dir, "nation")
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    s = _t(spark, sf_dir, "supplier")
    vol = (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nkey"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            _revenue().alias("volume"),
            "supp_nation",
        )
    )
    return (
        vol.groupBy("o_year")
        .agg(
            (
                F.sum(F.when(F.col("supp_nation") == "NATION_7", F.col("volume")))
                .cast("double")
                / F.sum("volume").cast("double")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@query(
    "q9_product_type_profit",
    oracle="""
    SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))) AS DOUBLE)
             - 0.1 * CAST(sum(CAST(p_retailprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
             AS sum_profit
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE 'red%'
    GROUP BY n_name, o_year
    ORDER BY nation, o_year DESC
    """,
    doc="TPC-H Q9 analogue: profit on red parts by supplier nation × year; "
    "cost side uses p_retailprice×quantity (no partsupp.supplycost) scaled "
    "by 0.1 OUTSIDE the aggregate, so both engines accumulate exact "
    "decimals and do the same two double ops at the end.",
)
def q9_product_type_profit(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    o = _t(spark, sf_dir, "orders")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    joined = (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    return (
        joined.groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(
            (
                F.sum(_revenue()).cast("double")
                - F.lit(0.1)
                * F.sum(dec2("p_retailprice") * dec2("l_quantity")).cast("double")
            ).alias("sum_profit")
        )
        .orderBy("nation", F.col("o_year").desc())
    )


@query(
    "q11_important_parts",
    oracle="""
    WITH v AS (
      SELECT l_partkey AS partkey,
             sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS val
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_12'
      GROUP BY 1
    )
    SELECT partkey, CAST(val AS DOUBLE) AS part_value
    FROM v
    WHERE CAST(val AS DOUBLE) > (SELECT CAST(sum(val) AS DOUBLE) FROM v) * 0.001
    ORDER BY part_value DESC, partkey
    """,
    doc="TPC-H Q11 analogue: parts whose NATION_12 shipped value exceeds "
    "0.1% of the nation total. The scalar subquery reduces v to ONE row "
    "before the crossJoin, so at scale it is a broadcast of 16 bytes, and "
    "v itself is computed once (Spark reuses the shuffle via the "
    "self-referencing plan; threshold compare in double on both sides).",
)
def q11_important_parts(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_12")
    v = (
        l.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum(dec2("l_extendedprice") * dec2("l_quantity")).alias("val"))
    )
    total = v.agg((F.sum("val").cast("double") * F.lit(0.001)).alias("threshold"))
    return (
        v.crossJoin(F.broadcast(total))
        .filter(F.col("val").cast("double") > F.col("threshold"))
        .select("partkey", F.col("val").cast("double").alias("part_value"))
        .orderBy(F.col("part_value").desc(), "partkey")
    )


@query(
    "q12_late_shipment_priority",
    oracle="""
    SELECT l_returnflag,
           count(*) FILTER (WHERE o_orderpriority IN ('1-URGENT','2-HIGH'))     AS high_line_count,
           count(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT','2-HIGH')) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    doc="TPC-H Q12 analogue: priority mix of late lines (ship > order+90d "
    "stands in for receipt > commit), bucketed by l_returnflag in lieu of "
    "l_shipmode. Conditional counts stay integral (BIGINT) in both engines.",
)
def q12_late_shipment_priority(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .groupBy("l_returnflag")
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q13_customer_distribution",
    oracle="""
    WITH c_orders AS (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer
      LEFT JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
      GROUP BY c_custkey
    )
    SELECT c_count, count(*) AS custdist
    FROM c_orders GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    doc="TPC-H Q13: order-count distribution over customers, the join "
    "predicate (priority filter) living in the LEFT JOIN's ON clause so "
    "order-less customers survive with c_count = 0. Two aggregations: the "
    "first shuffles on custkey (same key as the join — one exchange), the "
    "second on the tiny c_count domain.",
)
def q13_customer_distribution(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "5-LOW")
    c_orders = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        c_orders.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@query(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-07-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_rev = (SELECT max(total_rev) FROM revenue)
    ORDER BY s_suppkey
    """,
    doc="TPC-H Q15: supplier(s) with max 1997-H1 revenue. The max is taken "
    "over the per-supplier aggregate (|suppliers| rows), reduced to one "
    "row and broadcast; equality is on the exact DECIMAL, so ties are "
    "found exactly as DuckDB finds them.",
)
def q15_top_supplier(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01 00:00:00")
        & (F.col("l_shipdate") < "1997-07-01 00:00:00")
    )
    s = _t(spark, sf_dir, "supplier")
    revenue = (
        l.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_revenue()).alias("total_rev"))
    )
    top = revenue.agg(F.max("total_rev").alias("max_rev"))
    return (
        revenue.crossJoin(F.broadcast(top))
        .filter(F.col("total_rev") == F.col("max_rev"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            "s_suppkey", "s_name", F.col("total_rev").cast("double").alias("total_revenue")
        )
        .orderBy("s_suppkey")
    )


@query(
    "q16_supplier_part_counts",
    oracle="""
    SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#45' AND p_type <> 'MEDIUM'
      AND p_size IN (1, 4, 9, 15, 23, 36, 45, 49)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    doc="TPC-H Q16 analogue: distinct supplier counts per (brand, type, "
    "size) bucket, the supplier blacklist keyed on negative balance "
    "instead of the absent comment column. NOT IN is an anti-join against "
    "a broadcast dim (never null here, so NOT IN == ANTI is safe).",
)
def q16_supplier_part_counts(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#45")
        & (F.col("p_type") != "MEDIUM")
        & F.col("p_size").isin(1, 4, 9, 15, 23, 36, 45, 49)
    )
    bad = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        l.join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@query(
    "q20_part_promotion_suppliers",
    oracle="""
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_name LIKE 'red%'
        AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY l_suppkey, l_partkey
      HAVING sum(l_quantity) > 60
    )
    ORDER BY s_suppkey
    """,
    doc="TPC-H Q20 analogue: suppliers who moved >60 units of some red part "
    "in 1997 (partsupp.availqty threshold recast over shipped volume). "
    "The IN becomes a semi-join against the HAVING-filtered aggregate; "
    "l_quantity is integral so a double sum is exact.",
)
def q20_part_promotion_suppliers(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01 00:00:00")
        & (F.col("l_shipdate") < "1998-01-01 00:00:00")
    )
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    s = _t(spark, sf_dir, "supplier")
    movers = (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 60)
        .select("l_suppkey")
    )
    return (
        s.join(movers, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


@query(
    "q21_waiting_supplier",
    oracle="""
    WITH late AS (
      SELECT l_orderkey, l_suppkey
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderstatus = 'F'
        AND l_shipdate > o_orderdate + INTERVAL 60 DAY
      GROUP BY l_orderkey, l_suppkey
    ),
    allsup AS (SELECT l_orderkey, l_suppkey FROM lineitem GROUP BY l_orderkey, l_suppkey)
    SELECT s_name, count(*) AS numwait
    FROM late l1
    JOIN supplier ON l1.l_suppkey = s_suppkey
    WHERE EXISTS (SELECT 1 FROM allsup a
                  WHERE a.l_orderkey = l1.l_orderkey AND a.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM late l2
                      WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
    doc="TPC-H Q21 analogue: in finished multi-supplier orders, suppliers "
    "who were the ONLY late one (ship > order+60d). The oracle states it "
    "as EXISTS/NOT EXISTS self-joins; the Spark plan is the algebraic "
    "rewrite — one deduplicated (order, supplier, was_late) relation, then "
    "per-order window counts: 'another supplier exists' ⇔ n_sup > 1, 'no "
    "other late supplier' ⇔ n_late = 1. One scan of lineitem, no "
    "self-joins, and both shuffles are on the order key (the second is a "
    "co-partitioned window). Ordering is total (s_name unique per group), "
    "so LIMIT 20 is deterministic.",
)
def q21_waiting_supplier(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus", "o_orderdate")
    s = _t(spark, sf_dir, "supplier")
    was_late = (
        (F.col("o_orderstatus") == "F")
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
    )
    # Left join so the pairs relation covers every lineitem even without a
    # matching order (order-less lines simply can't be late) — keeps the
    # rewrite equivalent to the oracle without assuming FK integrity.
    # One explicit shuffle on the order key serves BOTH the (order, supplier)
    # aggregation (hash partitioning on a subset of the grouping keys
    # satisfies its clustering) and the per-order window — without it Spark
    # plans two back-to-back exchanges. Map-side combine is worthless here
    # (|pairs| ≈ |lineitems|), so pre-partitioning raw rows costs nothing.
    pairs = (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"), "left")
        .repartition(F.col("l_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(F.when(was_late, 1).otherwise(0)).alias("is_late"))
    )
    w = Window.partitionBy("l_orderkey")
    lonely_late = (
        pairs.withColumn("n_sup", F.count("*").over(w))
        .withColumn("n_late", F.sum("is_late").over(w))
        .filter((F.col("is_late") == 1) & (F.col("n_sup") > 1) & (F.col("n_late") == 1))
    )
    return (
        lonely_late.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


@query(
    "q22_dormant_customers",
    oracle="""
    WITH avg_bal AS (
      SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
               / CAST(count(*) AS DOUBLE) AS avg_acctbal
      FROM customer WHERE c_acctbal > 0
    )
    SELECT n_name AS nation, count(*) AS numcust,
           CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    CROSS JOIN avg_bal
    WHERE c_acctbal > avg_acctbal
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
    GROUP BY n_name
    ORDER BY nation
    """,
    doc="TPC-H Q22 analogue: wealthy customers dormant since 1999 (every "
    "customer here has some order, so the anti-join is date-bounded; "
    "nation stands in for the absent phone prefix). The average is "
    "sum/count in BOTH engines (exact decimal sum ÷ exact count, one "
    "IEEE divide), broadcast as a single row.",
)
def q22_dormant_customers(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    recent = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= "1999-01-01 00:00:00")
        .select("o_custkey")
    )
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0)
        .agg(
            (
                F.sum(dec2("c_acctbal")).cast("double")
                / F.count("*").cast("double")
            ).alias("avg_acctbal")
        )
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_acctbal"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("*").alias("numcust"),
            F.sum(dec2("c_acctbal")).cast("double").alias("totacctbal"),
        )
        .orderBy("nation")
    )
