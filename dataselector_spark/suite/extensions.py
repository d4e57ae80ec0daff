"""Coverage extensions: TPC-H-class headline joins, source/sink round-trips
(SURVEY.md §2 B1), cross join (A29), GROUPING SETS (B7), and the explicit
Python-UDF surface (B21).

B1 round-trips write to /tmp and read back through an EXPLICIT schema — the
oracle runs against the original parquet, so a pass proves the sink+source
pair is lossless (Java's shortest-round-trip double formatting guarantees
text formats preserve doubles exactly).

B21 policy: pandas UDFs compute in integer-scaled exact arithmetic (prices
and quantities are 2-dp fixed-point), so grouped results hash-match a
DECIMAL-cast DuckDB oracle despite Python-side summation. This is the same
float policy as relational.py, ported across the Arrow boundary.
"""

from __future__ import annotations

import os

from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import load_table
from .base import query
from .base import dec2

_RT_ROOT = "/tmp/dataselector_roundtrip"


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


def _rt_path(sf_dir: str, name: str) -> str:
    return os.path.join(_RT_ROOT, os.path.basename(os.path.normpath(sf_dir)), name)


# --- TPC-H-class headline queries (B2/B6/B9 composition) ---------------------


@query(
    "q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate ASC, l_orderkey ASC
    LIMIT 10
    """,
    doc="TPC-H Q3 analogue (o_orderpriority stands in for o_shippriority): "
    "segment filter prunes customer before the join; top-10 is "
    "TakeOrderedAndProject, never a full sort.",
)
def q3_shipping_priority(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < "1998-03-15 00:00:00"
    )
    l = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > "1998-03-15 00:00:00"
    )
    disc = dec2(F.lit(1) - F.col("l_discount"), 4)
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(dec2("l_extendedprice") * disc).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("o_orderdate").asc(), F.col("l_orderkey").asc())
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n_name,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC
    """,
    doc="TPC-H Q5: six-table join. region/nation/supplier broadcast (dims), "
    "the two facts shuffle once each on their join keys; the local-supplier "
    "condition (c_nationkey = s_nationkey) rides the same join.",
)
def q5_local_supplier_volume(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01 00:00:00")
        & (F.col("o_orderdate") < "1998-01-01 00:00:00")
    )
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    disc = dec2(F.lit(1) - F.col("l_discount"), 4)
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(s),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(F.sum(dec2("l_extendedprice") * disc).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc())
    )


@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
           count(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.05
      AND l_quantity < 24
    """,
    doc="TPC-H Q6: pure scan-filter-aggregate — the predicate-pushdown "
    "benchmark. All three predicates reach the parquet reader "
    "(PushedFilters); the agg is a single partial+final pair.",
)
def q6_forecast_revenue(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= "1997-01-01 00:00:00")
            & (F.col("l_shipdate") < "1998-01-01 00:00:00")
            & (F.col("l_discount").between(0.03, 0.05))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(dec2("l_extendedprice") * dec2("l_discount", 4))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n"),
        )
    )


# --- A29: cross join ---------------------------------------------------------


@query(
    "a29_cross_join",
    oracle="""
    SELECT n_name, r_name FROM nation CROSS JOIN region
    """,
    doc="A29: the reference's only cross product (zoom-stack init, "
    "index.js:695-705) as an explicit crossJoin — both sides broadcast-sized "
    "dims, so the plan is a nested-loop over local rows, no shuffle.",
)
def a29_cross_join(spark, sf_dir):
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return n.crossJoin(F.broadcast(r)).select("n_name", "r_name")


# --- B7: grouping sets -------------------------------------------------------


@query(
    "b07_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           grouping(l_returnflag, l_linestatus) AS gid,
           CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           count(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())
    """,
    doc="B7: explicit GROUPING SETS (a non-hierarchical subset rollup can't "
    "express) via DataFrame.groupingSets — one Expand + one aggregate, not "
    "three scans.",
)
def b07_grouping_sets(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem")
    return l.groupingSets(
        [["l_returnflag", "l_linestatus"], ["l_linestatus"], []],
        "l_returnflag",
        "l_linestatus",
    ).agg(
        F.grouping_id().alias("gid"),
        F.sum(dec2("l_quantity")).cast("double").alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
    )


# --- B1: source/sink round-trips --------------------------------------------


@query(
    "b01_parquet_roundtrip",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag
    FROM lineitem WHERE l_returnflag = 'R'
    """,
    doc="B1: parquet sink partitioned by l_returnflag, read back with a "
    "partition-pruning filter — only the R directory is scanned (the "
    "file-layout analogue of the reference's per-compound catalog).",
)
def b01_parquet_roundtrip(spark, sf_dir):
    path = _rt_path(sf_dir, "lineitem_parquet")
    l = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_returnflag"
    )
    l.write.mode("overwrite").partitionBy("l_returnflag").parquet(path)
    back = spark.read.parquet(path).filter(F.col("l_returnflag") == "R")
    return back.select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
        F.col("l_returnflag").cast("string").alias("l_returnflag"),
    )


@query(
    "b01_csv_roundtrip",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
    FROM orders
    """,
    doc="B1: CSV sink + explicit-schema source. Doubles survive because the "
    "writer emits shortest-round-trip decimal text; the reader never "
    "infers (inference is banned at scale — one pass over 100 TB just to "
    "guess types).",
)
def b01_csv_roundtrip(spark, sf_dir):
    path = _rt_path(sf_dir, "orders_csv")
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority"
    )
    o.write.mode("overwrite").option("header", "true").csv(path)
    schema = T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    )
    return spark.read.schema(schema).option("header", "true").csv(path)


@query(
    "b01_json_roundtrip",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice
    FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
    doc="B1: line-delimited JSON sink + explicit-schema source, timestamps "
    "included (ISO-8601 at UTC both ways; ms precision preserved).",
)
def b01_json_roundtrip(spark, sf_dir):
    path = _rt_path(sf_dir, "orders_json")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    o.select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice").write.mode(
        "overwrite"
    ).json(path)
    schema = T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_totalprice", T.DoubleType()),
        ]
    )
    return spark.read.schema(schema).json(path)


# --- B21: Python UDF surface -------------------------------------------------


@query(
    "b21_pandas_udf_scalar",
    oracle="""
    SELECT event_id,
           upper(substr(event_type, 1, 3)) AS type_tag,
           value * 2.0 + 1.0 AS v_affine
    FROM events
    """,
    doc="B21: vectorized scalar pandas UDF (Arrow-batched, one Python call "
    "per ~10k rows — never row-at-a-time). Semantics chosen to be exactly "
    "SQL-expressible so the oracle hash-checks the Arrow boundary itself.",
)
def b21_pandas_udf_scalar(spark, sf_dir):
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def type_tag(s):
        return s.str.slice(0, 3).str.upper()

    @pandas_udf("double")
    def affine(v):
        return v * 2.0 + 1.0

    e = _t(spark, sf_dir, "events")
    return e.select(
        "event_id",
        type_tag("event_type").alias("type_tag"),
        affine("value").alias("v_affine"),
    )


@query(
    "b21_grouped_applyinpandas",
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) * 10000 AS BIGINT) AS sum_pq_e4,
           CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) * 100 AS BIGINT) AS sum_qty_e2,
           count(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="B21: grouped applyInPandas UDAF. Python sums in integer-scaled "
    "exact arithmetic (2-dp fixed point -> int64 via round-half-even at "
    "1e-2), so the grouped result hash-matches the DECIMAL oracle bit for "
    "bit. Shuffle is the same single hash-partition a built-in agg pays; "
    "the Python stage processes each group as one Arrow batch.",
)
def b21_grouped_applyinpandas(spark, sf_dir):
    def agg_group(pdf):
        import pandas as pd

        p = (pdf["l_extendedprice"] * 100).round().astype("int64")
        q = (pdf["l_quantity"] * 100).round().astype("int64")
        return pd.DataFrame(
            {
                "l_returnflag": [pdf["l_returnflag"].iloc[0]],
                "sum_pq_e4": [int((p * q).sum())],
                "sum_qty_e2": [int(q.sum())],
                "n": [len(pdf)],
            }
        )

    l = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice", "l_quantity"
    )
    return l.groupBy("l_returnflag").applyInPandas(
        agg_group,
        schema="l_returnflag string, sum_pq_e4 long, sum_qty_e2 long, n long",
    )


@query(
    "b21_python_udtf",
    oracle="""
    SELECT o_orderkey, part_idx + 1 AS part_no, part
    FROM (
        SELECT o_orderkey,
               generate_subscripts(string_split(o_orderpriority, '-'), 1) - 1 AS part_idx,
               unnest(string_split(o_orderpriority, '-')) AS part
        FROM orders
    )
    """,
    doc="B21: table-function surface — one row in, N rows out — expressed as "
    "posexplode over a split (JVM-side generator; a Python UDTF would pay "
    "serialization for identical semantics, so the generator form IS the "
    "idiomatic Spark UDTF).",
)
def b21_python_udtf(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.posexplode(F.split("o_orderpriority", "-")).alias("part_idx", "part"),
    ).select("o_orderkey", (F.col("part_idx") + 1).alias("part_no"), "part")


@query(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 AS avg_yearly,
           count(*) AS n
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#23'
      AND l_quantity < (
          SELECT 0.2 * avg(l_quantity) FROM lineitem l2
          WHERE l2.l_partkey = lineitem.l_partkey
      )
    """,
    doc="TPC-H Q17: correlated scalar subquery, run through spark.sql so "
    "Catalyst's decorrelation rewrites it into the aggregate+join plan — "
    "proving the subquery surface, not hand-decorrelating. The per-part avg "
    "is exact (integer-valued doubles sum exactly in IEEE), so the boundary "
    "comparison is deterministic across engines. Brand filter broadcasts "
    "part; one shuffle per lineitem branch.",
)
def q17_small_quantity_revenue(spark, sf_dir):
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("q17_lineitem")
    _t(spark, sf_dir, "part").createOrReplaceTempView("q17_part")
    return spark.sql("""
        SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 AS avg_yearly,
               count(*) AS n
        FROM q17_lineitem JOIN q17_part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#23'
          AND l_quantity < (
              SELECT 0.2 * avg(l_quantity) FROM q17_lineitem l2
              WHERE l2.l_partkey = q17_lineitem.l_partkey
          )
    """)


@query(
    "q18_large_volume_customer",
    oracle="""
    SELECT c_name, c_custkey, o_orderkey, o_orderdate,
           CAST(o_totalprice AS DOUBLE) AS o_totalprice,
           CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING sum(CAST(l_quantity AS DECIMAL(12,2))) > 300
    )
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderdate ASC, o_orderkey ASC
    LIMIT 100
    """,
    doc="TPC-H Q18: grouped-HAVING IN-subquery = aggregate + left-semi join "
    "in the DataFrame plan. The qualifying-order set is small, so it "
    "broadcasts into the fact join; top-100 is TakeOrderedAndProject.",
)
def q18_large_volume_customer(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(dec2("l_quantity")).alias("q"))
        .filter(F.col("q") > 300)
        .select("l_orderkey")
    )
    return (
        o.join(F.broadcast(big), o.o_orderkey == big.l_orderkey, "left_semi")
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(l, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum(dec2("l_quantity")).cast("double").alias("sum_qty"))
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate",
            F.col("o_totalprice").cast("double").alias("o_totalprice"), "sum_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .limit(100)
    )


@query(
    "q19_discounted_revenue",
    oracle="""
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
           count(*) AS n
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 20 AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 30 AND l_quantity BETWEEN 20 AND 30)
    """,
    doc="TPC-H Q19: disjunctive mixed-table predicates over a broadcast "
    "join. The part-only conjuncts can't prune the lineitem scan, but "
    "Catalyst pushes the derivable disjunction of l_quantity ranges; part "
    "broadcasts so the OR evaluates stream-side with no shuffle.",
)
def q19_discounted_revenue(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    disc = dec2(F.lit(1) - F.col("l_discount"), 4)
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 10) & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 20) & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 30) & F.col("l_quantity").between(20, 30))
    )
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(
            F.sum(dec2("l_extendedprice") * disc).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n"),
        )
    )


# --- B22: data-quality validation battery ------------------------------------


@query(
    "b22_quality_checks",
    oracle=r"""
    SELECT 'not_null:event_type' AS check_name,
           count(*) FILTER (WHERE event_type IS NULL) AS violations,
           count(*) AS total,
           count(*) FILTER (WHERE event_type IS NULL) = 0 AS ok
    FROM events
    UNION ALL
    SELECT 'in_range:value',
           count(*) FILTER (WHERE value IS NOT NULL AND value NOT BETWEEN 0 AND 200),
           count(*),
           count(*) FILTER (WHERE value IS NOT NULL AND value NOT BETWEEN 0 AND 200) = 0
    FROM events
    UNION ALL
    SELECT 'matches:props',
           count(*) FILTER (WHERE props IS NOT NULL AND NOT regexp_matches(props, '^\{')),
           count(*),
           count(*) FILTER (WHERE props IS NOT NULL AND NOT regexp_matches(props, '^\{')) = 0
    FROM events
    UNION ALL
    SELECT 'unique:event_id',
           (SELECT CAST(coalesce(sum(n - 1), 0) AS BIGINT)
            FROM (SELECT count(*) AS n FROM events GROUP BY event_id)),
           (SELECT count(*) FROM events),
           (SELECT coalesce(sum(n - 1), 0) FROM (SELECT count(*) AS n FROM events GROUP BY event_id)) = 0
    UNION ALL
    SELECT 'ref:l_orderkey->o_orderkey',
           (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
                (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)),
           (SELECT count(*) FROM lineitem),
           (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
                (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) = 0
    """,
    doc="B22: declarative data-quality battery (the reference's QC purpose, "
    "machine-checked): null/range/format checks fold into ONE conditional-"
    "sum pass over one scan; uniqueness and referential integrity are "
    "aggregate / anti-join counts. The in_range check intentionally "
    "flags rows (value > 200 exists) to prove detection.",
)
def b22_quality_checks(spark, sf_dir):
    from ..operators.validate import (
        in_range,
        matches,
        not_null,
        referential_violations,
        run_checks,
        uniqueness_violations,
    )

    e = _t(spark, sf_dir, "events")
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    row_checks = run_checks(
        e,
        [
            not_null("event_type"),
            in_range("value", 0, 200),
            matches("props", r"^\{"),
        ],
    )
    return (
        row_checks.unionByName(uniqueness_violations(e, ["event_id"]))
        .unionByName(referential_violations(l, "l_orderkey", o, "o_orderkey"))
    )


@query(
    "b06_pivot",
    oracle="""
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           count(*) FILTER (WHERE event_type = 'click')    AS click,
           count(*) FILTER (WHERE event_type = 'error')    AS error,
           count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           count(*) FILTER (WHERE event_type = 'signup')   AS signup,
           count(*) FILTER (WHERE event_type = 'view')     AS view
    FROM events GROUP BY 1
    """,
    doc="B6: pivot (long->wide) with EXPLICIT pivot values — omitting them "
    "costs an extra distinct-collect job and makes the output schema "
    "data-dependent, both wrong at scale. Plans as one conditional-count "
    "aggregation, same as the oracle's FILTER form.",
)
def b06_pivot(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"))
        .pivot("event_type", ["click", "error", "purchase", "signup", "view"])
        .count()
        .na.fill(0)
    )


@query(
    "b06_histogram",
    oracle="""
    SELECT CAST(floor(value / 25.0) AS BIGINT) AS bin,
           25.0 * floor(value / 25.0) AS bin_lo,
           count(*) AS n
    FROM events GROUP BY 1, 2
    """,
    doc="B6: fixed-width histogram by arithmetic binning — one partial-agg "
    "pass, O(bins) shuffle; the building block for quality-score and "
    "length distributions over a 100 TB corpus.",
)
def b06_histogram(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    bin_ = F.floor(F.col("value") / 25.0)
    return e.groupBy(
        bin_.cast("bigint").alias("bin"), (bin_ * 25.0).alias("bin_lo")
    ).agg(F.count(F.lit(1)).alias("n"))


@query(
    "b22_stratified_sample",
    oracle=None,  # sampling is engine-specific RNG; fractions pinned in tests
    doc="B22: per-stratum Bernoulli sampling (sampleBy on lang, seeded) — "
    "the standard corpus down-sampling/rebalancing step in LLM data "
    "pipelines. Deterministic for a fixed seed and partitioning; fraction "
    "accuracy asserted in tests, not hash-compared.",
)
def b22_stratified_sample(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    fractions = {"en": 0.5, "es": 0.25, "fr": 0.25, "de": 0.25, "zh": 0.1}
    return d.sampleBy("lang", fractions, seed=42).select("doc_id", "lang")


@query(
    "b06_percentiles",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.25) AS q25,
           quantile_cont(l_quantity, 0.5)  AS q50,
           quantile_cont(l_quantity, 0.75) AS q75,
           count(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="B6: exact continuous percentiles per group — both engines define "
    "quantiles by sort + linear interpolation over identical doubles, so "
    "the result hash-matches despite being order-statistics. At 100 TB the "
    "drop-in substitute is approx_percentile (t-digest sketch, fixed "
    "memory); the exact form is the oracle-parity variant.",
)
def b06_percentiles(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", F.lit(0.25)).alias("q25"),
        F.percentile("l_quantity", F.lit(0.5)).alias("q50"),
        F.percentile("l_quantity", F.lit(0.75)).alias("q75"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "b02_join_salted",
    oracle="""
    SELECT l_orderkey, o_orderpriority, count(*) AS n
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY l_orderkey, o_orderpriority
    """,
    doc="B2: skew-salted equi-join (operators/skew.py) — the skewed side "
    "salted per-row, the other side replicated over the salt range; result "
    "set identical to the plain join (this oracle IS the plain join), cost "
    "is an 8x blow-up of the replicated side in exchange for spreading a "
    "hot key over 8 shuffle partitions. Manual fallback for pathological "
    "skew beyond AQE's runtime splitting.",
)
def b02_join_salted(spark, sf_dir):
    from ..operators.skew import salted_join

    l = _t(spark, sf_dir, "lineitem").select("l_orderkey", F.col("l_linenumber"))
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    joined = salted_join(l, o, on="l_orderkey", buckets=8, entropy_cols=("l_linenumber",))
    return joined.groupBy("l_orderkey", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n")
    )


@query(
    "b06_unpivot",
    oracle="""
    SELECT event_id, 'value' AS metric, value AS v FROM events
    UNION ALL
    SELECT event_id, 'user_id', CAST(user_id AS DOUBLE) FROM events
    """,
    doc="B6: unpivot/melt (wide->long, the inverse of b06_pivot) — plans as "
    "one Expand over one scan, the same shape the oracle spells as "
    "UNION ALL without re-reading the table.",
)
def b06_unpivot(spark, sf_dir):
    e = _t(spark, sf_dir, "events").select(
        "event_id", F.col("value"), F.col("user_id").cast("double").alias("user_id")
    )
    return e.unpivot("event_id", ["value", "user_id"], "metric", "v")


@query(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-10-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey
                  AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    doc="TPC-H Q4: EXISTS = left-semi join against the filtered lineitem "
    "side; the date filter pushes to the orders scan before the join.",
)
def q4_order_priority(spark, sf_dir):
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-07-01 00:00:00")
        & (F.col("o_orderdate") < "1997-10-01 00:00:00")
    )
    l = _t(spark, sf_dir, "lineitem")
    late = o.join(
        l,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "q7_volume_shipping",
    oracle="""
    SELECT supp_nation, cust_nation, l_year,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               year(l_shipdate) AS l_year, l_extendedprice, l_discount
        FROM supplier
        JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
            OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
          AND l_shipdate BETWEEN TIMESTAMP '1997-01-01 00:00:00'
                             AND TIMESTAMP '1998-12-31 00:00:00'
    )
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
    doc="TPC-H Q7: two broadcast copies of nation under different roles "
    "(supplier vs customer side) with a disjunctive nation-pair filter; "
    "facts shuffle once each.",
)
def q7_volume_shipping(spark, sf_dir):
    s = _t(spark, sf_dir, "supplier")
    l = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between("1997-01-01 00:00:00", "1998-12-31 00:00:00")
    )
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    disc = dec2(F.lit(1) - F.col("l_discount"), 4)
    pair = (
        ((F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7"))
        | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
    )
    return (
        F.broadcast(s).join(l, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(dec2("l_extendedprice") * disc).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
           n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-10-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey ASC
    LIMIT 20
    """,
    doc="TPC-H Q10: returned-item revenue per customer, one quarter — "
    "broadcast nation, pushed flag + date filters, top-20 TakeOrdered.",
)
def q10_returned_items(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-10-01 00:00:00")
        & (F.col("o_orderdate") < "1998-01-01 00:00:00")
    )
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    disc = dec2(F.lit(1) - F.col("l_discount"), 4)
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(dec2("l_extendedprice") * disc).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


@query(
    "q14_promo_revenue",
    oracle="""
    SELECT CAST(100.0 * sum(CASE WHEN p_type = 'PROMO'
                 THEN CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))
                 ELSE CAST(0 AS DECIMAL(16,4)) END) AS DOUBLE)
           / CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))) AS DOUBLE)
           AS promo_revenue_pct,
           count(*) AS n
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'
    """,
    doc="TPC-H Q14: conditional aggregation over a broadcast part join — "
    "both sums decimal-exact, one IEEE division at the end.",
)
def q14_promo_revenue(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-09-01 00:00:00")
        & (F.col("l_shipdate") < "1997-10-01 00:00:00")
    )
    p = _t(spark, sf_dir, "part")
    rev = dec2("l_extendedprice") * dec2(F.lit(1) - F.col("l_discount"), 4)
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(
        F.lit(0).cast("decimal(16,4)")
    )
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                (F.lit(100.0) * F.sum(promo).cast("double"))
                / F.sum(rev).cast("double")
            ).alias("promo_revenue_pct"),
            F.count(F.lit(1)).alias("n"),
        )
    )


# --- B1 (continued): ORC + text sources, B23: incremental refresh -----------


@query(
    "b01_orc_roundtrip",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderdate
    FROM orders WHERE o_orderstatus = 'F'
    """,
    doc="B1: ORC sink + explicit-schema source (ORC ships in Spark core — "
    "the second columnar format besides Parquet; same pushdown/pruning "
    "machinery). Timestamps survive at µs precision both ways.",
)
def b01_orc_roundtrip(spark, sf_dir):
    path = _rt_path(sf_dir, "orders_orc")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    o.select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate").write.mode(
        "overwrite"
    ).orc(path)
    schema = T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampType()),
        ]
    )
    return spark.read.schema(schema).orc(path)


@query(
    "b01_text_roundtrip",
    oracle="SELECT text AS value FROM documents",
    doc="B1: whole-line text sink + source (the raw-corpus format LLM "
    "pipelines start from). documents.text is single-line ASCII "
    "(TESTDATA), so line-per-row round-trips exactly.",
)
def b01_text_roundtrip(spark, sf_dir):
    path = _rt_path(sf_dir, "documents_text")
    d = _t(spark, sf_dir, "documents").select("text")
    d.write.mode("overwrite").text(path)
    return spark.read.text(path)


@query(
    "b23_merge_upsert",
    oracle="""
    WITH src AS (
      SELECT o_orderkey, o_custkey, o_orderstatus,
             CAST(CAST(o_totalprice AS DECIMAL(12,2)) * CAST(2 AS DECIMAL(3,0)) AS DOUBLE) AS o_totalprice,
             o_orderdate, o_orderpriority
      FROM orders WHERE o_orderpriority = '1-URGENT'
      UNION ALL
      SELECT o_orderkey + 10000000, o_custkey, o_orderstatus,
             CAST(CAST(o_totalprice AS DECIMAL(12,2)) * CAST(2 AS DECIMAL(3,0)) AS DOUBLE) AS o_totalprice,
             o_orderdate, o_orderpriority
      FROM orders WHERE o_orderpriority = '1-URGENT'
    )
    SELECT * FROM orders WHERE o_orderkey NOT IN (SELECT o_orderkey FROM src)
    UNION ALL
    SELECT * FROM src
    """,
    doc="B23: keyed SCD-1 MERGE (operators/merge.py merge_upsert) — the "
    "batch generalization of the reference's insert-or-replace session "
    "store (index.js:510-534). Source = urgent orders repriced ×2 plus the "
    "same rows re-keyed as inserts; target rows lose on key collision. One "
    "anti-join shuffle; bucket both sides by key to make it co-located.",
)
def b23_merge_upsert(spark, sf_dir):
    from ..operators.merge import merge_upsert

    o = _t(spark, sf_dir, "orders")
    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
            "o_orderdate", "o_orderpriority"]
    repriced = dec2("o_totalprice") * F.lit(2).cast("decimal(3,0)")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT")
    updates = urgent.withColumn("o_totalprice", repriced.cast("double"))
    inserts = updates.withColumn("o_orderkey", F.col("o_orderkey") + F.lit(10000000))
    src = updates.select(*cols).unionByName(inserts.select(*cols))
    return merge_upsert(o.select(*cols), src, ["o_orderkey"])


@query(
    "b23_apply_changelog",
    oracle="""
    WITH c AS (
      SELECT l_orderkey AS k, l_linenumber AS v,
             CASE WHEN l_returnflag = 'R' THEN 'D' ELSE 'U' END AS op,
             l_quantity, l_extendedprice
      FROM lineitem
    ),
    r AS (
      SELECT *, row_number() OVER (
        PARTITION BY k
        ORDER BY v DESC, CASE WHEN op = 'D' THEN 0 ELSE 1 END,
                 l_quantity, l_extendedprice
      ) AS rn FROM c
    )
    SELECT k, v, op, l_quantity, l_extendedprice FROM r
    WHERE rn = 1 AND op <> 'D'
    """,
    doc="B23: CDC changelog compaction (operators/merge.py apply_changelog) "
    "— latest version per key wins, winning deletes drop the key. The "
    "changelog is synthesized from lineitem (key=orderkey, "
    "version=linenumber, returnflag R ⇒ delete); compaction is one "
    "row_number window per key; ties prefer the delete, then fall to "
    "payload columns ((k,v) is NOT unique in this data — without a total "
    "order the survivor is engine-dependent).",
)
def b23_apply_changelog(spark, sf_dir):
    from ..operators.merge import apply_changelog

    l = _t(spark, sf_dir, "lineitem")
    changelog = l.select(
        F.col("l_orderkey").alias("k"),
        F.col("l_linenumber").alias("v"),
        F.when(F.col("l_returnflag") == "R", "D").otherwise("U").alias("op"),
        "l_quantity",
        "l_extendedprice",
    )
    return apply_changelog(
        changelog, ["k"], "v", tiebreakers=["l_quantity", "l_extendedprice"]
    )


@query(
    "b22_mixture_resample",
    oracle="""
    SELECT doc_id, source, lang
    FROM documents
    WHERE (doc_id * 2654435761) % 1000 <
          CASE source
            WHEN 'src0' THEN 300
            WHEN 'src1' THEN 900
            WHEN 'src2' THEN 700
            ELSE 500
          END
    """,
    doc="B22: deterministic mixture resampling — per-source keep rates "
    "applied through a Knuth-hash gate on the stable doc key instead of "
    "an RNG, so the sample is reproducible across runs, engines, and "
    "partitionings (resumable/auditable corpus builds; rand()-based "
    "sample() is none of those). Pure filter: pushes to the scan, no "
    "shuffle. Rates here: src0 30%, src1 90%, src2 70%, default 50%.",
)
def b22_mixture_resample(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    rate = (
        F.when(F.col("source") == "src0", 300)
        .when(F.col("source") == "src1", 900)
        .when(F.col("source") == "src2", 700)
        .otherwise(500)
    )
    gate = (F.col("doc_id") * F.lit(2654435761)) % 1000
    return d.filter(gate < rate).select("doc_id", "source", "lang")
