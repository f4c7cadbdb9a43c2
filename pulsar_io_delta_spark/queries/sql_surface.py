"""Shared-dialect SQL surface: each query here is ONE SQL string that
runs verbatim on both Spark (``spark.sql`` over temp views) and DuckDB
(the oracle) — demonstrating the engine's SQL front door and pinning
cross-engine semantics (TPC-H-style star joins, grouping sets,
correlated/scalar subqueries) with zero translation drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pulsar_io_delta_spark.registry import register
from pulsar_io_delta_spark.tables import table


def _run_shared(spark: SparkSession, sf_dir: str, sql: str, tables: list[str]) -> DataFrame:
    for name in tables:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
    return spark.sql(sql)


def shared_sql_query(name: str, sql: str, tables: list[str]):
    @register(name, oracle=sql)
    def _q(spark, sf_dir, _sql=sql, _tables=tuple(tables)):
        return _run_shared(spark, sf_dir, _sql, list(_tables))

    _q.__name__ = name
    return _q


# TPC-H Q3 (shipping priority), adapted to the fixture schema
# (o_orderpriority stands in for o_shippriority).
shared_sql_query(
    "q_sql_tpch_q3",
    """
SELECT l_orderkey,
       round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,6)))
                  AS DOUBLE), 4) AS revenue,
       CAST(o_orderdate AS DATE) AS odate, o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY l_orderkey, CAST(o_orderdate AS DATE), o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 20
""",
    ["customer", "orders", "lineitem"],
)

# TPC-H Q5 (local supplier volume).
shared_sql_query(
    "q_sql_tpch_q5",
    """
SELECT n_name,
       round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,6)))
                  AS DOUBLE), 4) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n_name
""",
    ["customer", "orders", "lineitem", "supplier", "nation", "region"],
)

# Explicit GROUPING SETS with per-column grouping flags.
shared_sql_query(
    "q_sql_grouping_sets",
    """
SELECT l_returnflag, l_linestatus,
       CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
       CAST(grouping(l_linestatus) AS BIGINT) AS g_status,
       count(*) AS cnt,
       round(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
""",
    ["lineitem"],
)

# Correlated EXISTS + scalar subquery (exact max/2 threshold keeps the
# comparison engine-portable; avg would be summation-order-dependent).
shared_sql_query(
    "q_sql_subqueries",
    """
SELECT c_custkey, c_name, c_acctbal
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
  AND c_acctbal > (SELECT max(c_acctbal) / 2 FROM customer)
""",
    ["customer", "orders"],
)

# IN / NOT IN subqueries.
shared_sql_query(
    "q_sql_in_subquery",
    """
SELECT o_orderkey, o_totalprice
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY')
  AND o_orderkey NOT IN (SELECT l_orderkey FROM lineitem WHERE l_quantity > 49)
""",
    ["orders", "customer", "lineitem"],
)

# CASE + conditional aggregation (pivot-style, engine-portable nulls:
# sum over zero matched rows is NULL in both engines).
shared_sql_query(
    "q_sql_conditional_agg",
    """
SELECT o_orderstatus,
       CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS BIGINT) AS p_urgent,
       CAST(sum(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 END) AS BIGINT) AS p_high,
       CAST(sum(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 END) AS BIGINT) AS p_medium,
       CAST(sum(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 END) AS BIGINT) AS p_notspec,
       CAST(sum(CASE WHEN o_orderpriority = '5-LOW' THEN 1 END) AS BIGINT) AS p_low
FROM orders GROUP BY o_orderstatus
""",
    ["orders"],
)


# TPC-H Q1 (pricing summary report) — the canonical scan+aggregate:
# decimal sums keep the oracle hash exact and order-independent.
shared_sql_query(
    "q_sql_tpch_q1",
    """
SELECT l_returnflag, l_linestatus,
       round(CAST(sum(CAST(l_quantity AS DECIMAL(24,6))) AS DOUBLE), 4) AS sum_qty,
       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(24,6))) AS DOUBLE), 4) AS sum_base_price,
       round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,8)))
                  AS DOUBLE), 4) AS sum_disc_price,
       round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                           AS DECIMAL(30,8))) AS DOUBLE), 4) AS sum_charge,
       round(CAST(sum(CAST(l_quantity AS DECIMAL(24,6))) AS DOUBLE) / count(*), 4) AS avg_qty,
       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(24,6))) AS DOUBLE) / count(*), 4) AS avg_price,
       round(CAST(sum(CAST(l_discount AS DECIMAL(24,6))) AS DOUBLE) / count(*), 4) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
    ["lineitem"],
)

# TPC-H Q6 (forecasting revenue change) — the canonical fully-pushed
# scan: every predicate reaches the parquet reader, one global sum.
shared_sql_query(
    "q_sql_tpch_q6",
    """
SELECT round(CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(24,6)))
                  AS DOUBLE), 4) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.04 AND 0.08
  AND l_quantity < 24
""",
    ["lineitem"],
)

# TPC-H Q14 (promotion effect), adapted to the fixture schema — a
# fact⋈dim join feeding a conditional-aggregate ratio.
shared_sql_query(
    "q_sql_tpch_q14",
    """
SELECT round(
         100.00 * CAST(sum(CASE WHEN p_type LIKE 'PROMO%'
                       THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,6))
                       ELSE CAST(0 AS DECIMAL(24,6)) END) AS DOUBLE)
         / CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,6))) AS DOUBLE),
         4) AS promo_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-09-01'
  AND l_shipdate < TIMESTAMP '1996-10-01'
""",
    ["lineitem", "part"],
)

# TPC-H Q18 (large-volume customers) — IN over a grouped-HAVING
# subquery on the same fact table, then a 3-way re-join.
shared_sql_query(
    "q_sql_tpch_q18",
    """
SELECT c_name, c_custkey, o_orderkey,
       CAST(o_orderdate AS DATE) AS odate, o_totalprice,
       round(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_qty
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                     GROUP BY l_orderkey HAVING sum(l_quantity) > 280)
GROUP BY c_name, c_custkey, o_orderkey, CAST(o_orderdate AS DATE), o_totalprice
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
""",
    ["customer", "orders", "lineitem"],
)

# TPC-H Q19 (discounted revenue), adapted to the fixture schema (brand
# / size / quantity stand in for the container terms) — preserves the
# disjunction-of-conjunctions predicate the optimizer must push through
# a join.
shared_sql_query(
    "q_sql_tpch_q19",
    """
SELECT round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,6)))
                  AS DOUBLE), 4) AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
       AND l_quantity >= 1 AND l_quantity <= 21)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 20
       AND l_quantity >= 10 AND l_quantity <= 30)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 25
       AND l_quantity >= 20 AND l_quantity <= 40)
""",
    ["lineitem", "part"],
)

# TPC-H Q10 (returned-item reporting) — customer/nation star join over
# a returnflag filter with a top-20 revenue ranking.
shared_sql_query(
    "q_sql_tpch_q10",
    """
SELECT c_custkey, c_name,
       round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,6)))
                  AS DOUBLE), 4) AS revenue,
       n_name
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
    ["customer", "orders", "lineitem", "nation"],
)
