"""Relational operator inventory (SURVEY §2.2-§2.7) over the driver
testdata tables, each with a DuckDB oracle.

Every query is written DataFrame-first so Catalyst handles pushdown,
pruning, and join selection; ``covers`` ties each entry back to the
SURVEY §2 operator ids it exercises.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..sources.io import read_table
from .registry import Query

MONEY = "decimal(18,2)"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


def _money(c) -> F.Column:
    return c.cast(MONEY)


# ---------------------------------------------------------------------------
# q01 — pricing summary (TPC-H Q1 shape): scan + filter + group agg
# ---------------------------------------------------------------------------

def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3/A9/P1/P13 analog of the reference's count-style reports
    (src/build_graph.py:221) scaled to a full aggregate battery."""
    li = _t(spark, sf_dir, "lineitem")
    disc_price = _money(F.col("l_extendedprice")) * _money(1 - F.col("l_discount"))
    charge = disc_price * _money(1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_money(F.col("l_quantity"))).cast("double").alias("sum_qty"),
            F.sum(_money(F.col("l_extendedprice"))).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            F.round(
                F.sum(_money(F.col("l_quantity"))).cast("double") / F.count(F.lit(1)), 2
            ).alias("avg_qty"),
            F.round(
                F.sum(_money(F.col("l_extendedprice"))).cast("double") / F.count(F.lit(1)), 2
            ).alias("avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


Q01_SQL = f"""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS {MONEY})) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS {MONEY})) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS {MONEY}) * CAST(1 - l_discount AS {MONEY})) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice AS {MONEY}) * CAST(1 - l_discount AS {MONEY}) * CAST(1 + l_tax AS {MONEY})) AS DOUBLE) AS sum_charge,
       ROUND(CAST(SUM(CAST(l_quantity AS {MONEY})) AS DOUBLE) / COUNT(*), 2) AS avg_qty,
       ROUND(CAST(SUM(CAST(l_extendedprice AS {MONEY})) AS DOUBLE) / COUNT(*), 2) AS avg_price,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# q02 — pushdown-friendly scan/filter/project (S1, P1, P15)
# ---------------------------------------------------------------------------

def q02_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate").between("1996-01-01", "1996-12-31"))
            & (F.col("l_quantity") > 45)
        )
        .select("l_orderkey", "l_partkey", "l_linenumber", "l_quantity")
    )


Q02_SQL = """
SELECT l_orderkey, l_partkey, l_linenumber, l_quantity
FROM lineitem
WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31'
  AND l_quantity > 45
"""


# ---------------------------------------------------------------------------
# q03 — deterministic row index (S5: create_dataset.py:8-9)
# ---------------------------------------------------------------------------

def q03_row_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    # limit-then-rank: orderBy+limit is a distributed TakeOrdered
    # (top-100 per partition, merge on driver); the global window then
    # only numbers 100 rows. A bare global row_number would funnel the
    # whole table through one partition.
    w = W.orderBy("c_custkey")
    return (
        cust.select("c_custkey")
        .orderBy("c_custkey")
        .limit(100)
        .withColumn("rn", F.row_number().over(w))
    )


Q03_SQL = """
SELECT c_custkey, rn FROM (
  SELECT c_custkey, ROW_NUMBER() OVER (ORDER BY c_custkey) AS rn
  FROM customer
) WHERE rn <= 100
"""


# ---------------------------------------------------------------------------
# q04 — conditional expression (P8: build_graph.py:105-108 when/otherwise)
# ---------------------------------------------------------------------------

def q04_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 100000, F.lit("small"))
        .when(F.col("o_totalprice") < 300000, F.lit("medium"))
        .otherwise(F.lit("large"))
    )
    return (
        orders.withColumn("bucket", bucket)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


Q04_SQL = """
SELECT CASE WHEN o_totalprice < 100000 THEN 'small'
            WHEN o_totalprice < 300000 THEN 'medium'
            ELSE 'large' END AS bucket,
       COUNT(*) AS n_orders
FROM orders GROUP BY 1
"""


# ---------------------------------------------------------------------------
# q05 — coalesce / null defaults (P9: coalesce(category,'unknown')
#        at build_graph.py:151-157) + null-predicate filter (P10)
# ---------------------------------------------------------------------------

def q05_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    etype = F.coalesce(F.nullif(F.col("event_type"), F.lit("view")), F.lit("unknown"))
    return (
        ev.withColumn("etype", etype)
        .filter(F.col("etype").isNotNull())
        .groupBy("etype")
        .agg(F.count(F.lit(1)).alias("n"))
    )


Q05_SQL = """
SELECT COALESCE(NULLIF(event_type, 'view'), 'unknown') AS etype, COUNT(*) AS n
FROM events
WHERE COALESCE(NULLIF(event_type, 'view'), 'unknown') IS NOT NULL
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# q06 — string battery (P6 concat_ws, P7 lower/regex, F5 split, F6 length,
#        F7 trim; mirrors key-building at build_graph.py:85-88,120-129)
# ---------------------------------------------------------------------------

def q06_string_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.lower(F.regexp_replace(F.col("c_name"), "[^A-Za-z0-9]+", "_")).alias("slug"),
        F.concat_ws("_", F.lower("c_mktsegment"), F.col("c_custkey")).alias("seg_key"),
        F.split(F.col("c_name"), "#").getItem(1).alias("cust_num"),
        F.length(F.col("c_name")).alias("name_len"),
        F.trim(F.lit("  pad  ")).alias("trimmed"),
    )


Q06_SQL = """
SELECT c_custkey,
       LOWER(REGEXP_REPLACE(c_name, '[^A-Za-z0-9]+', '_', 'g')) AS slug,
       CONCAT_WS('_', LOWER(c_mktsegment), c_custkey) AS seg_key,
       STRING_SPLIT(c_name, '#')[2] AS cust_num,
       CAST(LENGTH(c_name) AS INT) AS name_len,
       TRIM('  pad  ') AS trimmed
FROM customer
"""


# ---------------------------------------------------------------------------
# q07 — date part extraction (F10: year() at rag.py:167 question)
# ---------------------------------------------------------------------------

def q07_date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.select(
            F.year("o_orderdate").alias("o_year"),
            F.month("o_orderdate").alias("o_month"),
        )
        .groupBy("o_year", "o_month")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


Q07_SQL = """
SELECT CAST(YEAR(o_orderdate) AS INT) AS o_year,
       CAST(MONTH(o_orderdate) AS INT) AS o_month,
       COUNT(*) AS n_orders
FROM orders GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# q08 — inner equi-join + agg (J1: generate_note_embeddings.py:37)
# ---------------------------------------------------------------------------

def q08_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_money(F.col("o_totalprice"))).cast("double").alias("revenue"),
        )
    )


Q08_SQL = f"""
SELECT c_mktsegment, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS {MONEY})) AS DOUBLE) AS revenue
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# q09 — multi-hop join chain (J3: Cypher pattern joins, rag.baml:279).
# TPC-H Q5 shape: 6-way join with a small-dim broadcast chain.
# ---------------------------------------------------------------------------

def q09_multihop_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph-pattern query as chained equi-joins. region/nation are
    broadcast dims; customer-supplier nation equality mirrors the
    reference's key-matching edge semantics (J2)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    revenue = _money(F.col("l_extendedprice")) * _money(1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .filter(cust.c_nationkey == supp.s_nationkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .filter(F.col("r_name") == "ASIA")
        .filter(
            (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .groupBy("n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
    )


Q09_SQL = f"""
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice AS {MONEY}) * CAST(1 - l_discount AS {MONEY})) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1995-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n_name
"""


# ---------------------------------------------------------------------------
# q10/q11 — semi/anti join (J2 FK-validation semantics:
# build_graph.py:257-268 MATCH-MERGE drops unmatched rows)
# ---------------------------------------------------------------------------

def q10_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    recent = orders.filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
    return cust.join(recent, cust.c_custkey == recent.o_custkey, "left_semi").select(
        "c_custkey", "c_mktsegment"
    )


Q10_SQL = """
SELECT c_custkey, c_mktsegment FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey
                AND o_orderdate >= TIMESTAMP '2000-01-01')
"""


def q11_antijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey"
    )


Q11_SQL = """
SELECT c_custkey FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


# ---------------------------------------------------------------------------
# q12 — group-count + HAVING (A5: "multiple immunizations", rag.py:163)
# ---------------------------------------------------------------------------

def q12_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") > 15)
    )


Q12_SQL = """
SELECT o_custkey, COUNT(*) AS n_orders
FROM orders GROUP BY o_custkey HAVING COUNT(*) > 15
"""


# ---------------------------------------------------------------------------
# q13 — COUNT(DISTINCT) (A4: RETURN count(DISTINCT p), rag.baml:279-284)
# ---------------------------------------------------------------------------

def q13_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    return cust.groupBy("c_mktsegment").agg(
        F.countDistinct("c_nationkey").alias("n_nations"),
        F.count(F.lit(1)).alias("n_customers"),
    )


Q13_SQL = """
SELECT c_mktsegment, COUNT(DISTINCT c_nationkey) AS n_nations,
       COUNT(*) AS n_customers
FROM customer GROUP BY 1
"""


# ---------------------------------------------------------------------------
# q14 — argmax / top-1 group (A7: "practitioner who treated the most
# patients", rag.py:169; deterministic tie-break)
# ---------------------------------------------------------------------------

def q14_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.countDistinct("c_custkey").alias("n_customers"))
        .orderBy(F.desc("n_customers"), F.asc("n_name"))
        .limit(1)
    )


Q14_SQL = """
SELECT n_name, COUNT(DISTINCT c_custkey) AS n_customers
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
ORDER BY n_customers DESC, n_name ASC
LIMIT 1
"""


# ---------------------------------------------------------------------------
# q15 — unique value enumeration (A8: "unique categories", rag.py:166)
# ---------------------------------------------------------------------------

def q15_distinct_enum(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return orders.select("o_orderstatus", "o_orderpriority").distinct()


Q15_SQL = "SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders"


# ---------------------------------------------------------------------------
# q16 — filtered range count (A6: born 1990-2000 / immunized after date,
# rag.py:167-168)
# ---------------------------------------------------------------------------

def q16_range_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return orders.filter(
        F.year("o_orderdate").between(1996, 1998) & (F.col("o_totalprice") > 200000)
    ).agg(F.count(F.lit(1)).alias("n_orders"))


Q16_SQL = """
SELECT COUNT(*) AS n_orders FROM orders
WHERE YEAR(o_orderdate) BETWEEN 1996 AND 1998 AND o_totalprice > 200000
"""


# ---------------------------------------------------------------------------
# q17 — global top-k (O2/O3: .limit(5) search truncation) with unique
# tie-break key
# ---------------------------------------------------------------------------

def q17_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", F.col("o_totalprice").cast(MONEY).cast("double").alias("price"))
        .orderBy(F.desc("price"), F.asc("o_orderkey"))
        .limit(10)
    )


Q17_SQL = f"""
SELECT o_orderkey, CAST(CAST(o_totalprice AS {MONEY}) AS DOUBLE) AS price
FROM orders ORDER BY price DESC, o_orderkey ASC LIMIT 10
"""


# ---------------------------------------------------------------------------
# q18 — union-all of per-batch subsets (U1: concatenate_json.py:40-49)
# ---------------------------------------------------------------------------

def q18_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    a = cust.filter(F.col("c_mktsegment") == "BUILDING").select(
        "c_custkey", F.lit("batch_a").alias("batch")
    )
    b = cust.filter(F.col("c_acctbal") > 9000).select(
        "c_custkey", F.lit("batch_b").alias("batch")
    )
    return a.unionByName(b)


Q18_SQL = """
SELECT c_custkey, 'batch_a' AS batch FROM customer WHERE c_mktsegment = 'BUILDING'
UNION ALL
SELECT c_custkey, 'batch_b' AS batch FROM customer WHERE c_acctbal > 9000
"""


# ---------------------------------------------------------------------------
# q19/q20 — window functions (O1 ordering, A7 per-group rank)
# ---------------------------------------------------------------------------

def q19_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.sum(_money(F.col("o_totalprice"))).over(w).cast("double").alias("running_total"),
    )


Q19_SQL = f"""
SELECT o_orderkey, o_custkey,
       CAST(SUM(CAST(o_totalprice AS {MONEY})) OVER (
            PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
       AS running_total
FROM orders
"""


def q20_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .select("o_custkey", "o_orderkey", "rn")
    )


Q20_SQL = """
SELECT o_custkey, o_orderkey, rn FROM (
  SELECT o_custkey, o_orderkey,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders
) WHERE rn <= 2
"""


# ---------------------------------------------------------------------------
# q21 — JSON field extraction (F11: from_json over nested FHIR bundles,
# baml_extract_eval.py:205-208; here over events.props)
# ---------------------------------------------------------------------------

def q21_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("sum_k"),
            F.count(F.lit(1)).alias("n"),
        )
    )


Q21_SQL = """
SELECT event_type,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
       COUNT(*) AS n
FROM events GROUP BY 1
"""


# ---------------------------------------------------------------------------
# q22 — pivot (wide reshaping; oracle as conditional aggregation)
# ---------------------------------------------------------------------------

_SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]


def q22_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    piv = (
        cust.groupBy("c_nationkey")
        .pivot("c_mktsegment", _SEGMENTS)
        .agg(F.count(F.lit(1)))
    )
    cols = [F.col("c_nationkey")] + [
        F.coalesce(F.col(s), F.lit(0)).alias(s.lower()) for s in _SEGMENTS
    ]
    return piv.select(*cols)


Q22_SQL = """
SELECT c_nationkey,
       COUNT(*) FILTER (c_mktsegment = 'AUTOMOBILE') AS automobile,
       COUNT(*) FILTER (c_mktsegment = 'BUILDING')   AS building,
       COUNT(*) FILTER (c_mktsegment = 'FURNITURE')  AS furniture,
       COUNT(*) FILTER (c_mktsegment = 'HOUSEHOLD')  AS household,
       COUNT(*) FILTER (c_mktsegment = 'MACHINERY')  AS machinery
FROM customer GROUP BY c_nationkey
"""


# ---------------------------------------------------------------------------
# q23 — rollup subtotals (beyond-reference coverage; SURVEY §2.4 notes
# no grouping sets in reference — included for engine completeness)
# ---------------------------------------------------------------------------

def q23_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.sum(_money(F.col("l_quantity"))).cast("double").alias("sum_qty"))
    )


Q23_SQL = f"""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS {MONEY})) AS DOUBLE) AS sum_qty
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


# ---------------------------------------------------------------------------
# q24 — time-bucketed event aggregation (batch form of the streaming
# window; events table per TESTDATA.md)
# ---------------------------------------------------------------------------

def q24_time_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.withColumn("hour", F.date_trunc("hour", F.col("ts")))
        .groupBy("hour", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_money(F.col("value"))).cast("double").alias("sum_value"),
        )
    )


Q24_SQL = f"""
SELECT date_trunc('hour', ts) AS hour, event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS {MONEY})) AS DOUBLE) AS sum_value
FROM events GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# q25 — orders above their customer's average (correlated-aggregate
# shape, decorrelated as an explicit join on both sides)
# ---------------------------------------------------------------------------

def q25_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    stats = orders.groupBy("o_custkey").agg(
        F.sum(_money(F.col("o_totalprice"))).cast("double").alias("tot"),
        F.count(F.lit(1)).alias("cnt"),
    )
    avg = stats.select(
        F.col("o_custkey").alias("k"), (F.col("tot") / F.col("cnt")).alias("cust_avg")
    )
    return (
        orders.join(avg, orders.o_custkey == avg.k)
        .filter(F.col("o_totalprice") > F.col("cust_avg"))
        .select("o_orderkey")
    )


Q25_SQL = f"""
WITH stats AS (
  SELECT o_custkey AS k,
         CAST(SUM(CAST(o_totalprice AS {MONEY})) AS DOUBLE) / COUNT(*) AS cust_avg
  FROM orders GROUP BY 1
)
SELECT o_orderkey FROM orders JOIN stats ON o_custkey = k
WHERE o_totalprice > cust_avg
"""


# ---------------------------------------------------------------------------
# q103 — variable-length trail paths (J3 second half: the reference's
# Cypher `-[r*1..4]-` bounded pattern, README.md:137)
# ---------------------------------------------------------------------------

def q103_variable_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded ``*1..3`` variable-length pattern with TRAIL semantics
    (no relationship reuse), over a deliberately cyclic directed
    graph: intra-region nation adjacency — every pair of same-region
    nations is a mutual edge, so edge-reuse pruning is genuinely
    exercised (a→b→a at hops=2 is legal, two distinct directed
    edges; a→b→a→b is not). Renders the reference's Kuzu
    ``MATCH (a)-[r*1..4]-(b)`` capability (README.md:137) on the
    testdata graph; the oracle is a DuckDB recursive CTE carrying
    the visited-edge list — the same determinism discipline as
    q66's components oracle."""
    from ..operators.graph import variable_length_paths

    nation = _t(spark, sf_dir, "nation")
    a, b = nation.alias("a"), nation.alias("b")
    edges = a.join(
        F.broadcast(b),
        (F.col("a.n_regionkey") == F.col("b.n_regionkey"))
        & (F.col("a.n_nationkey") != F.col("b.n_nationkey")),
    ).select(
        F.col("a.n_nationkey").alias("src"),
        F.col("b.n_nationkey").alias("dst"),
    )
    return variable_length_paths(edges, "src", "dst", 1, 3)


Q103_SQL = """
WITH RECURSIVE e AS (
  SELECT CAST(a.n_nationkey AS VARCHAR) AS src,
         CAST(b.n_nationkey AS VARCHAR) AS dst,
         CAST(a.n_nationkey AS VARCHAR) || '>' ||
         CAST(b.n_nationkey AS VARCHAR) AS ek
  FROM nation a
  JOIN nation b
    ON a.n_regionkey = b.n_regionkey
   AND a.n_nationkey <> b.n_nationkey
),
walk(start, cur, hops, path) AS (
  SELECT src, dst, 1, [ek] FROM e
  UNION ALL
  SELECT w.start, e.dst, w.hops + 1, list_append(w.path, e.ek)
  FROM walk w
  JOIN e ON w.cur = e.src
  WHERE w.hops < 3 AND NOT list_contains(w.path, e.ek)
)
SELECT DISTINCT start, cur AS "end", hops FROM walk
"""


def q105_undirected_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference pattern's TRUE semantics: Cypher's ``-[r*1..3]-``
    is UNDIRECTED — a trail may not reuse a relationship in either
    direction, so the 2-hop round trip a—b—a that q103's directed
    rendering legally emits (two distinct directed edges) is absent
    here (one relationship, reused). Same nation adjacency graph;
    the oracle symmetrizes with an unordered LEAST/GREATEST edge key."""
    from ..operators.graph import variable_length_paths

    nation = _t(spark, sf_dir, "nation")
    a, b = nation.alias("a"), nation.alias("b")
    edges = a.join(
        F.broadcast(b),
        (F.col("a.n_regionkey") == F.col("b.n_regionkey"))
        & (F.col("a.n_nationkey") < F.col("b.n_nationkey")),
    ).select(
        F.col("a.n_nationkey").alias("src"),
        F.col("b.n_nationkey").alias("dst"),
    )
    return variable_length_paths(
        edges, "src", "dst", 1, 3, undirected=True
    )


Q105_SQL = """
WITH RECURSIVE e AS (
  SELECT CAST(a.n_nationkey AS VARCHAR) AS src,
         CAST(b.n_nationkey AS VARCHAR) AS dst,
         LEAST(CAST(a.n_nationkey AS VARCHAR),
               CAST(b.n_nationkey AS VARCHAR)) || '>' ||
         GREATEST(CAST(a.n_nationkey AS VARCHAR),
                  CAST(b.n_nationkey AS VARCHAR)) AS ek
  FROM nation a
  JOIN nation b
    ON a.n_regionkey = b.n_regionkey
   AND a.n_nationkey <> b.n_nationkey
),
walk(start, cur, hops, path) AS (
  SELECT src, dst, 1, [ek] FROM e
  UNION ALL
  SELECT w.start, e.dst, w.hops + 1, list_append(w.path, e.ek)
  FROM walk w
  JOIN e ON w.cur = e.src
  WHERE w.hops < 3 AND NOT list_contains(w.path, e.ek)
)
SELECT DISTINCT start, cur AS "end", hops FROM walk
"""


# q105 entered as an r7 TAIL addition (local-gate verified at both
# SFs that round); the r8 rotation pulled it into the gate window
# head, so it now lives in the regular QUERIES list.
QUERIES = [
    Query("q105_undirected_paths", q105_undirected_paths, Q105_SQL,
          ("J3",), "Cypher undirected *1..3 trails (no edge reuse)"),
    Query("q01_pricing_summary", q01_pricing_summary, Q01_SQL,
          ("P1", "P13", "A3", "F12"), "TPC-H Q1-shape aggregate battery"),
    Query("q02_filter_project", q02_filter_project, Q02_SQL,
          ("S1", "P1", "P15"), "pushdown scan/filter/project"),
    Query("q03_row_number", q03_row_number, Q03_SQL,
          ("S5",), "deterministic 1-based row index"),
    Query("q04_case_when", q04_case_when, Q04_SQL,
          ("P8",), "when/otherwise bucketing"),
    Query("q05_coalesce", q05_coalesce, Q05_SQL,
          ("P9", "P10"), "coalesce + null-predicate filter"),
    Query("q06_string_ops", q06_string_ops, Q06_SQL,
          ("P6", "P7", "F1", "F5", "F6", "F7"), "string function battery"),
    Query("q07_date_parts", q07_date_parts, Q07_SQL,
          ("F10",), "date part extraction + group"),
    Query("q08_join_agg", q08_join_agg, Q08_SQL,
          ("J1", "A3"), "inner equi-join + aggregate"),
    Query("q09_multihop_revenue", q09_multihop_revenue, Q09_SQL,
          ("J3", "J2", "A3"), "6-way graph-pattern join chain"),
    Query("q10_semijoin", q10_semijoin, Q10_SQL,
          ("J2",), "left-semi FK validation"),
    Query("q11_antijoin", q11_antijoin, Q11_SQL,
          ("J2",), "left-anti (unmatched rows)"),
    Query("q12_having", q12_having, Q12_SQL,
          ("A5",), "group count + HAVING"),
    Query("q13_count_distinct", q13_count_distinct, Q13_SQL,
          ("A4",), "COUNT(DISTINCT) per group"),
    Query("q14_argmax", q14_argmax, Q14_SQL,
          ("A7", "O3"), "top-1 group with tie-break"),
    Query("q15_distinct_enum", q15_distinct_enum, Q15_SQL,
          ("A8", "A1"), "distinct value enumeration"),
    Query("q16_range_count", q16_range_count, Q16_SQL,
          ("A6",), "filtered range count"),
    Query("q17_topk", q17_topk, Q17_SQL,
          ("O2", "O4"), "global top-k with tie-break"),
    Query("q18_union", q18_union, Q18_SQL,
          ("U1",), "union-all of tagged subsets"),
    Query("q19_window_running", q19_window_running, Q19_SQL,
          ("O1",), "running sum window"),
    Query("q20_window_rank", q20_window_rank, Q20_SQL,
          ("A7", "O5"), "per-group top-n via row_number"),
    Query("q21_json_extract", q21_json_extract, Q21_SQL,
          ("F11",), "JSON field extraction + agg"),
    Query("q22_pivot", q22_pivot, Q22_SQL,
          ("A3",), "pivot to wide counts"),
    Query("q23_rollup", q23_rollup, Q23_SQL,
          ("A3",), "rollup subtotals"),
    Query("q24_time_bucket", q24_time_bucket, Q24_SQL,
          ("F10", "A3"), "hourly event buckets"),
    Query("q25_above_avg", q25_above_avg, Q25_SQL,
          ("A5", "J1", "F12"), "orders above customer average"),
    Query("q103_variable_paths", q103_variable_paths, Q103_SQL,
          ("J3",), "Cypher *1..3 trail paths (recursive-CTE oracle)"),
]
