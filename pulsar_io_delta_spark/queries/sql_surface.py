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

# TPC-H Q2 (minimum-cost supplier), adapted to the fixture schema:
# there is no partsupp table, so lineitem is the part↔supplier
# relation and s_acctbal stands in for ps_supplycost — preserving the
# shape that matters, a correlated scalar MIN subquery whose inner
# query repeats the outer's join chain.
shared_sql_query(
    "q_sql_tpch_q2",
    """
SELECT DISTINCT s_acctbal, s_name, n_name, p_partkey, p_name
FROM part, supplier, lineitem, nation, region
WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
  AND p_type = 'PROMO' AND p_size <= 15
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'EUROPE'
  AND s_acctbal = (SELECT min(s2.s_acctbal)
                   FROM supplier s2, lineitem l2, nation n2, region r2
                   WHERE l2.l_partkey = p_partkey AND s2.s_suppkey = l2.l_suppkey
                     AND s2.s_nationkey = n2.n_nationkey
                     AND n2.n_regionkey = r2.r_regionkey AND r2.r_name = 'EUROPE')
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
""",
    ["part", "supplier", "lineitem", "nation", "region"],
)

# TPC-H Q4 (order-priority checking), adapted: no l_commitdate /
# l_receiptdate in the fixture, so "late" is shipped >90 days after
# the order date — preserving the correlated-EXISTS-per-order shape.
shared_sql_query(
    "q_sql_tpch_q4",
    """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01'
  AND o_orderdate < TIMESTAMP '1996-10-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    ["orders", "lineitem"],
)

# TPC-H Q7 (volume shipping) — bidirectional nation-pair filter through
# a 6-table join, grouped by shipping year.
shared_sql_query(
    "q_sql_tpch_q7",
    """
SELECT supp_nation, cust_nation, l_year,
       round(CAST(sum(volume) AS DOUBLE), 4) AS revenue
FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS l_year,
             CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,6)) AS volume
      FROM supplier, lineitem, orders, customer, nation n1, nation n2
      WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
        AND c_custkey = o_custkey
        AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
        AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
          OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
        AND l_shipdate BETWEEN TIMESTAMP '1996-01-01'
                           AND TIMESTAMP '1997-12-31') shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
""",
    ["supplier", "lineitem", "orders", "customer", "nation"],
)

# TPC-H Q8 (national market share) — the share-of-total conditional
# aggregate over an 8-table star join.
shared_sql_query(
    "q_sql_tpch_q8",
    """
SELECT o_year,
       round(CAST(sum(CASE WHEN nation = 'NATION_5' THEN volume
                           ELSE CAST(0 AS DECIMAL(24,6)) END) AS DOUBLE)
             / CAST(sum(volume) AS DOUBLE), 4) AS mkt_share
FROM (SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
             CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,6)) AS volume,
             n2.n_name AS nation
      FROM part, supplier, lineitem, orders, customer, nation n1, nation n2,
           region
      WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
        AND l_orderkey = o_orderkey AND o_custkey = c_custkey
        AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
        AND r_name = 'AMERICA' AND s_nationkey = n2.n_nationkey
        AND o_orderdate BETWEEN TIMESTAMP '1996-01-01'
                            AND TIMESTAMP '1997-12-31'
        AND p_type = 'ECONOMY') all_nations
GROUP BY o_year
ORDER BY o_year
""",
    ["part", "supplier", "lineitem", "orders", "customer", "nation", "region"],
)

# TPC-H Q9 (product-type profit), adapted: no ps_supplycost, so
# p_retailprice×quantity is the cost leg — keeps the per-row computed
# profit expression aggregated by (nation, year).
shared_sql_query(
    "q_sql_tpch_q9",
    """
SELECT nation, o_year, round(CAST(sum(amount) AS DOUBLE), 4) AS sum_profit
FROM (SELECT n_name AS nation,
             CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
             CAST(l_extendedprice * (1 - l_discount)
                  - p_retailprice * l_quantity AS DECIMAL(30,8)) AS amount
      FROM part, supplier, lineitem, orders, nation
      WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
        AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
        AND p_name LIKE '%bolt%') profit
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
""",
    ["part", "supplier", "lineitem", "orders", "nation"],
)

# TPC-H Q11 (important stock), adapted to lineitem-as-partsupp: value
# per part vs a scalar-subquery fraction of the national total —
# preserves HAVING > (uncorrelated scalar subquery).
shared_sql_query(
    "q_sql_tpch_q11",
    """
SELECT l_partkey AS ps_partkey,
       round(CAST(sum(CAST(l_extendedprice * l_quantity AS DECIMAL(30,6)))
                  AS DOUBLE), 4) AS part_value
FROM lineitem, supplier, nation
WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
  AND n_name = 'NATION_7'
GROUP BY l_partkey
HAVING sum(CAST(l_extendedprice * l_quantity AS DECIMAL(30,6)))
     > (SELECT sum(CAST(l_extendedprice * l_quantity AS DECIMAL(30,6))) * 0.001
        FROM lineitem, supplier, nation
        WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
          AND n_name = 'NATION_7')
ORDER BY part_value DESC, ps_partkey
""",
    ["lineitem", "supplier", "nation"],
)

# TPC-H Q12 (shipping modes / priority classes), adapted: no
# l_shipmode or commit/receipt dates — linestatus buckets the lines,
# ship-lag >30 days is the delay predicate, and the CASE sums split
# critical vs non-critical priorities exactly as in the original.
shared_sql_query(
    "q_sql_tpch_q12",
    """
SELECT l_linestatus AS shipmode,
       CAST(sum(CASE WHEN o_orderpriority = '1-URGENT'
                       OR o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END)
            AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority <> '1-URGENT'
                      AND o_orderpriority <> '2-HIGH' THEN 1 ELSE 0 END)
            AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 30 DAY
  AND l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY l_linestatus
ORDER BY shipmode
""",
    ["orders", "lineitem"],
)

# TPC-H Q13 (customer order-count distribution), adapted: the comment
# anti-filter becomes a priority filter in the LEFT JOIN's ON clause —
# the shape is the two-level aggregate over an outer join that must
# keep order-less customers.
shared_sql_query(
    "q_sql_tpch_q13",
    """
SELECT c_count, count(*) AS custdist
FROM (SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
    ["customer", "orders"],
)

# TPC-H Q15 (top supplier) — the revenue view is a CTE referenced
# twice; the scalar MAX ties out exactly because revenue is a decimal
# sum.
shared_sql_query(
    "q_sql_tpch_q15",
    """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,6)))
           AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name,
       round(CAST(total_revenue AS DOUBLE), 4) AS total_revenue
FROM supplier, revenue
WHERE s_suppkey = supplier_no
  AND total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s_suppkey
""",
    ["supplier", "lineitem"],
)

# TPC-H Q16 (parts/supplier relationship), adapted to
# lineitem-as-partsupp with the NOT IN supplier exclusion (negative
# balance stands in for the complaints comment filter) and the
# COUNT(DISTINCT) over the surviving suppliers.
shared_sql_query(
    "q_sql_tpch_q16",
    """
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#23' AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
""",
    ["lineitem", "part", "supplier"],
)

# TPC-H Q17 (small-quantity-order revenue) — the correlated scalar AVG
# subquery per part. Quantities are integral doubles, so the average
# is exact and engine-portable.
shared_sql_query(
    "q_sql_tpch_q17",
    """
SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(24,6))) AS DOUBLE)
             / 7.0, 4) AS avg_yearly
FROM lineitem, part
WHERE p_partkey = l_partkey AND p_brand = 'Brand#23'
  AND l_quantity < (SELECT 0.2 * avg(l_quantity) FROM lineitem l2
                    WHERE l2.l_partkey = p_partkey)
""",
    ["lineitem", "part"],
)

# TPC-H Q20 (potential part promotion), adapted: IN nested inside IN —
# suppliers who moved >50 units of 'small…' parts in 1996, restricted
# to one nation.
shared_sql_query(
    "q_sql_tpch_q20",
    """
SELECT s_name, s_acctbal
FROM supplier, nation
WHERE s_suppkey IN (
        SELECT l_suppkey FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM part
                            WHERE p_name LIKE 'small%')
          AND l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY l_suppkey
        HAVING sum(l_quantity) > 50)
  AND s_nationkey = n_nationkey AND n_name = 'NATION_4'
ORDER BY s_name
""",
    ["supplier", "lineitem", "part", "nation"],
)

# TPC-H Q21 (suppliers who kept orders waiting), adapted: "late" =
# shipped >60 days after the order date (no receipt/commit dates). The
# late set is a CTE referenced twice — EXISTS another supplier on the
# order, NOT EXISTS another *late* supplier — keeping the original's
# semi/anti-join pair with equality-only correlation.
shared_sql_query(
    "q_sql_tpch_q21",
    """
WITH late AS (
  SELECT l_orderkey, l_suppkey
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
  WHERE o_orderstatus = 'F'
    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
SELECT s_name, count(*) AS numwait
FROM supplier, late l1, nation
WHERE s_suppkey = l1.l_suppkey
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM late l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey)
  AND s_nationkey = n_nationkey AND n_name = 'NATION_12'
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
""",
    ["supplier", "lineitem", "orders", "nation"],
)

# TPC-H Q22 (global sales opportunity), adapted: no c_phone, so
# nationkey%5 is the "country code" bucket, and (because every fixture
# customer has orders) the anti-join excludes customers with URGENT
# orders rather than any orders — keeping the uncorrelated scalar AVG
# threshold + NOT EXISTS anti-join + re-aggregation.
shared_sql_query(
    "q_sql_tpch_q22",
    """
SELECT cntrycode, count(*) AS numcust,
       round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE), 4)
         AS totacctbal
FROM (SELECT CAST(c_nationkey % 5 AS BIGINT) AS cntrycode, c_acctbal,
             c_custkey
      FROM customer
      WHERE c_acctbal > (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,4)))
                                     AS DOUBLE) / count(*)
                         FROM customer WHERE c_acctbal > 0.00)
        AND NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey
                          AND o_orderpriority = '1-URGENT')) custsale
GROUP BY cntrycode
ORDER BY cntrycode
""",
    ["customer", "orders"],
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


# Round 5: gap sessionization through the shared dialect — ONE text
# proving ANSI window machinery (named WINDOW clause, lag, running sum,
# timestamp-minus-timestamp interval comparison) agrees across engines.
# The DataFrame form (q_sessionize) is the production path; this pins
# the SQL front door for the same semantics. Outputs use CAST(.. AS
# DATE) because epoch extraction has no shared spelling.
shared_sql_query(
    "q_sql_sessionize",
    """
SELECT user_id,
       CAST(session_seq AS BIGINT) AS session_seq,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(min(ts) AS DATE) AS start_day,
       CAST(max(ts) AS DATE) AS end_day
FROM (
  SELECT user_id, ts,
         sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM (
    SELECT user_id, ts, event_id,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR ts - lag(ts) OVER w > INTERVAL '30' MINUTE
                THEN 1 ELSE 0 END AS brk
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
  ) b
) s
GROUP BY user_id, session_seq
""",
    ["events"],
)


# Ordered funnel in the shared dialect: conditional window-mins chained
# through nested subqueries (stage k's entry time references stage k-1's
# column), shared via a multi-referenced CTE — the same single-scan,
# join-free shape the DataFrame operator (operators/sessionize.py
# funnel_counts) plans.
shared_sql_query(
    "q_sql_funnel",
    """
WITH u AS (
  SELECT user_id, t0, t1, t2 FROM (
    SELECT user_id, t0, t1,
           min(CASE WHEN event_type = 'purchase' AND ts > t1 THEN ts END)
             OVER (PARTITION BY user_id) AS t2
    FROM (
      SELECT user_id, event_type, ts, t0,
             min(CASE WHEN event_type = 'click' AND ts > t0 THEN ts END)
               OVER (PARTITION BY user_id) AS t1
      FROM (
        SELECT user_id, event_type, ts,
               min(CASE WHEN event_type = 'view' THEN ts END)
                 OVER (PARTITION BY user_id) AS t0
        FROM events
      ) s0
    ) s1
  ) s2
  GROUP BY user_id, t0, t1, t2
)
SELECT 'view' AS stage, CAST(count(t0) AS BIGINT) AS n_users FROM u
UNION ALL
SELECT 'click', CAST(count(t1) AS BIGINT) FROM u
UNION ALL
SELECT 'purchase', CAST(count(t2) AS BIGINT) FROM u
""",
    ["events"],
)


# Round 6: recursive CTE through the shared dialect (Spark 4 gained
# WITH RECURSIVE; DuckDB has it natively) — a data-driven month spine
# over the orders range, LEFT-joined to monthly counts so empty months
# survive with 0. One text, both engines; the recursion is bounded by
# the ~80-month fixture range, well under Spark's
# cteRecursionLevelLimit (100) — a wider fixture fails loudly there,
# never silently truncates. Scale note: the spine is O(months) rows on
# the driver-free path (each iteration is a one-row plan); the corpus
# touch is ONE grouped scan of orders.
shared_sql_query(
    "q_sql_recursive_series",
    """
WITH RECURSIVE bounds AS (
  SELECT CAST(date_trunc('month', min(o_orderdate)) AS TIMESTAMP) AS lo,
         CAST(max(o_orderdate) AS TIMESTAMP) AS hi
  FROM orders
),
months(m) AS (
  SELECT lo FROM bounds
  UNION ALL
  SELECT m + INTERVAL '1' MONTH FROM months, bounds
  WHERE m + INTERVAL '1' MONTH <= hi
),
cnt AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS m, count(*) AS n
  FROM orders GROUP BY 1
)
SELECT CAST(months.m AS DATE) AS month_start,
       CAST(coalesce(cnt.n, 0) AS BIGINT) AS n_orders
FROM months LEFT JOIN cnt ON cnt.m = months.m
""",
    ["orders"],
)
