"""Relational query surface (SURVEY.md §2.3, "Relational surface").

The reference implements none of these (SURVEY §2.2) — they are the
query surface the rebuild contract requires, expressed purely with the
DataFrame API so Catalyst applies pushdown/pruning/join-selection, and
AQE picks runtime strategies at scale.

Scale notes per operator family:
- joins: small dims (region/nation/supplier, and filtered builds) are
  explicitly `broadcast()`; large-large joins shuffle on their equi-keys
  and survive skew via AQE skew-join.
- aggregations: groupBy on low-cardinality keys → partial (map-side)
  aggregation makes the shuffle tiny; decimal sums avoid fp drift.
- windows: partitioned by a key (never a global window) so state is
  distributed; top-k uses sort+limit which Spark executes as a
  per-partition TakeOrdered + driver merge of k rows, not a full sort.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pulsar_io_delta_spark.queries._util import dsum, dsum_over, r4, sql_dsum
from pulsar_io_delta_spark.registry import register
from pulsar_io_delta_spark.tables import table

# Threshold making outer/semi/anti joins produce genuinely unmatched rows.
HI_PRICE = 400_000.0


@register(
    "q_filter_project",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity,
       round(l_extendedprice * (1 - l_discount), 4) AS revenue
FROM lineitem WHERE l_quantity > 30 AND l_discount < 0.05
""",
)
def q_filter_project(spark, sf_dir):
    l = table(spark, sf_dir, "lineitem")
    return l.where((F.col("l_quantity") > 30) & (F.col("l_discount") < 0.05)).select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        r4(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
    )


@register(
    "q_join_inner",
    oracle="""
SELECT o_orderkey, c_custkey, c_name, o_totalprice
FROM orders JOIN customer ON o_custkey = c_custkey
""",
)
def q_join_inner(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey).select(
        "o_orderkey", "c_custkey", "c_name", "o_totalprice"
    )


@register(
    "q_join_left",
    oracle=f"""
SELECT c_custkey, c_name, o_orderkey, o_totalprice
FROM customer LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > {HI_PRICE}) o
  ON c_custkey = o_custkey
""",
)
def q_join_left(spark, sf_dir):
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").where(F.col("o_totalprice") > HI_PRICE)
    return c.join(o, c.c_custkey == o.o_custkey, "left").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


@register(
    "q_join_right",
    oracle="""
SELECT o_orderkey, o_orderstatus, l_linenumber, l_quantity
FROM (SELECT * FROM lineitem WHERE l_quantity > 45) l
RIGHT JOIN orders ON l_orderkey = o_orderkey
""",
)
def q_join_right(spark, sf_dir):
    l = table(spark, sf_dir, "lineitem").where(F.col("l_quantity") > 45)
    o = table(spark, sf_dir, "orders")
    return l.join(o, l.l_orderkey == o.o_orderkey, "right").select(
        "o_orderkey", "o_orderstatus", "l_linenumber", "l_quantity"
    )


@register(
    "q_join_full",
    oracle=f"""
SELECT c_custkey, c_name, o_orderkey, o_totalprice
FROM (SELECT * FROM customer WHERE c_acctbal > 5000) c
FULL JOIN (SELECT * FROM orders WHERE o_totalprice > {HI_PRICE}) o
  ON c_custkey = o_custkey
""",
)
def q_join_full(spark, sf_dir):
    c = table(spark, sf_dir, "customer").where(F.col("c_acctbal") > 5000)
    o = table(spark, sf_dir, "orders").where(F.col("o_totalprice") > HI_PRICE)
    return c.join(o, c.c_custkey == o.o_custkey, "full").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


@register(
    "q_join_semi",
    oracle=f"""
SELECT c_custkey, c_name, c_acctbal FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > {HI_PRICE})
""",
)
def q_join_semi(spark, sf_dir):
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").where(F.col("o_totalprice") > HI_PRICE)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_acctbal"
    )


@register(
    "q_join_anti",
    oracle=f"""
SELECT c_custkey, c_name, c_acctbal FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > {HI_PRICE})
""",
)
def q_join_anti(spark, sf_dir):
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").where(F.col("o_totalprice") > HI_PRICE)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_acctbal"
    )


@register(
    "q_join_broadcast",
    oracle=f"""
SELECT r_name, n_name, count(*) AS cnt,
       round({sql_dsum("c_acctbal", "18,2")} / count(*), 4) AS avg_bal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
""",
)
def q_join_broadcast(spark, sf_dir):
    """Star join with explicitly broadcast dims — no shuffle of the fact
    side at any scale (nation/region are tiny forever)."""
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return joined.groupBy("r_name", "n_name").agg(
        F.count("*").alias("cnt"),
        r4(dsum("c_acctbal", "18,2") / F.count("*")).alias("avg_bal"),
    )


@register(
    "q_join_range",
    oracle="""
SELECT o_orderkey, l_linenumber, date_diff('day', o_orderdate, l_shipdate) AS lag_days
FROM lineitem JOIN orders
  ON l_orderkey = o_orderkey AND date_diff('day', o_orderdate, l_shipdate) > 90
""",
)
def q_join_range(spark, sf_dir):
    """Equi-key + range predicate join: the equi part keeps it a hash
    join (shuffle on orderkey); the range residual is evaluated post-match
    — never a cartesian product."""
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    lag_days = F.datediff(l.l_shipdate, o.o_orderdate)
    return l.join(o, (l.l_orderkey == o.o_orderkey) & (lag_days > 90)).select(
        "o_orderkey", "l_linenumber", lag_days.cast("long").alias("lag_days")
    )


@register(
    "q_agg_groupby",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       round({sql_dsum("l_quantity", "18,4")}, 4) AS sum_qty,
       round({sql_dsum("l_extendedprice", "18,2")}, 4) AS sum_base_price,
       round(CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(24,6))) AS DOUBLE), 4) AS sum_disc_price,
       round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                           AS DECIMAL(24,6))) AS DOUBLE), 4) AS sum_charge,
       round({sql_dsum("l_quantity", "18,4")} / count(*), 4) AS avg_qty,
       round({sql_dsum("l_extendedprice", "18,2")} / count(*), 4) AS avg_price,
       round({sql_dsum("l_discount", "12,6")} / count(*), 4) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-09-02'
GROUP BY l_returnflag, l_linestatus
""",
)
def q_agg_groupby(spark, sf_dir):
    """TPC-H Q1-style pricing summary (flagship). Partial aggregation
    makes the shuffle 4 rows per partition regardless of input size."""
    l = table(spark, sf_dir, "lineitem").where(F.col("l_shipdate") <= "2000-09-02")
    # Per-row double products are IEEE-identical across engines (same ops,
    # same associativity); the single decimal cast then makes the *sum*
    # order-independent. Keep the expression shapes in lockstep with the SQL.
    disc_price = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    charge = disc_price * (F.lit(1) + F.col("l_tax"))
    return l.groupBy("l_returnflag", "l_linestatus").agg(
        r4(dsum("l_quantity", "18,4")).alias("sum_qty"),
        r4(dsum("l_extendedprice", "18,2")).alias("sum_base_price"),
        r4(dsum(disc_price, "24,6")).alias("sum_disc_price"),
        r4(dsum(charge, "24,6")).alias("sum_charge"),
        r4(dsum("l_quantity", "18,4") / F.count("*")).alias("avg_qty"),
        r4(dsum("l_extendedprice", "18,2") / F.count("*")).alias("avg_price"),
        r4(dsum("l_discount", "12,6") / F.count("*")).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


@register(
    "q_agg_distinct",
    oracle=f"""
SELECT o_orderstatus, count(DISTINCT o_custkey) AS cnt_cust, count(*) AS cnt,
       round({sql_dsum("o_totalprice", "18,2")}, 4) AS sum_price
FROM orders GROUP BY o_orderstatus
""",
)
def q_agg_distinct(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("cnt_cust"),
        F.count("*").alias("cnt"),
        r4(dsum("o_totalprice", "18,2")).alias("sum_price"),
    )


@register(
    "q_agg_rollup",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
       round({sql_dsum("l_quantity", "18,4")}, 4) AS sum_qty, count(*) AS cnt
FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
""",
)
def q_agg_rollup(spark, sf_dir):
    l = table(spark, sf_dir, "lineitem")
    return l.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping_id().cast("long").alias("gid"),
        r4(dsum("l_quantity", "18,4")).alias("sum_qty"),
        F.count("*").alias("cnt"),
    )


@register(
    "q_agg_cube",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
       round({sql_dsum("l_quantity", "18,4")}, 4) AS sum_qty, count(*) AS cnt
FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
""",
)
def q_agg_cube(spark, sf_dir):
    l = table(spark, sf_dir, "lineitem")
    return l.cube("l_returnflag", "l_linestatus").agg(
        F.grouping_id().cast("long").alias("gid"),
        r4(dsum("l_quantity", "18,4")).alias("sum_qty"),
        F.count("*").alias("cnt"),
    )


@register(
    "q_agg_approx",
    oracle="""
SELECT o_orderpriority, CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact_cust,
       count(*) AS cnt, TRUE AS within_bound
FROM orders GROUP BY o_orderpriority
""",
)
def q_agg_approx(spark, sf_dir):
    """approx_count_distinct = HyperLogLog++, the 100 TB-scale path for
    distinct counts (mergeable sketch, no distinct shuffle) — under an
    error-bound contract the oracle can assert exactly: the sketch's
    HLL-hash is deterministic, and |approx − exact|/exact ≤ 0.25
    (5× the default 5% rsd) holds with overwhelming margin for any
    fixture regeneration, so the all-true column is a hard row, not a
    rows-only waiver. The raw approx value itself stays out of the
    hash (engine-specific sketch)."""
    o = table(spark, sf_dir, "orders")
    g = o.groupBy("o_orderpriority").agg(
        F.approx_count_distinct("o_custkey").alias("approx_cust"),
        F.countDistinct("o_custkey").cast("long").alias("exact_cust"),
        F.count("*").alias("cnt"),
    )
    return g.select(
        "o_orderpriority",
        "exact_cust",
        "cnt",
        (
            F.abs(F.col("approx_cust") - F.col("exact_cust"))
            / F.col("exact_cust")
            <= F.lit(0.25)
        ).alias("within_bound"),
    )


@register(
    "q_window_rank",
    oracle="""
SELECT * FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         CAST(rank() OVER (PARTITION BY o_orderpriority
                           ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rnk
  FROM orders) WHERE rnk <= 10
""",
)
def q_window_rank(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.select(
            "o_orderpriority",
            "o_orderkey",
            "o_totalprice",
            F.rank().over(w).cast("long").alias("rnk"),
        )
        .where(F.col("rnk") <= 10)
    )


@register(
    "q_window_running",
    oracle=f"""
SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS od,
       round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
             OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 4)
         AS run_total
FROM orders
""",
)
def q_window_running(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("od"),
        r4(dsum_over("o_totalprice", "18,2", w)).alias("run_total"),
    )


@register(
    "q_window_lag",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice,
       lag(o_totalprice) OVER (PARTITION BY o_custkey
                               ORDER BY o_orderdate, o_orderkey) AS prev_price,
       lead(o_totalprice) OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) AS next_price
FROM orders
""",
)
def q_window_lag(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
    )


@register(
    "q_topk",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
""",
)
def q_topk(spark, sf_dir):
    """orderBy+limit compiles to TakeOrderedAndProject: each task keeps
    only its top 100, the driver merges — no global sort at any scale."""
    o = table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@register(
    "q_union_all",
    oracle=f"""
SELECT o_orderkey, 'open' AS branch, o_totalprice FROM orders WHERE o_orderstatus = 'O'
UNION ALL
SELECT o_orderkey, 'big' AS branch, o_totalprice FROM orders WHERE o_totalprice > {HI_PRICE}
""",
)
def q_union_all(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    a = o.where(F.col("o_orderstatus") == "O").select(
        "o_orderkey", F.lit("open").alias("branch"), "o_totalprice"
    )
    b = o.where(F.col("o_totalprice") > HI_PRICE).select(
        "o_orderkey", F.lit("big").alias("branch"), "o_totalprice"
    )
    return a.unionAll(b)


@register(
    "q_union_distinct",
    oracle="""
SELECT c_nationkey AS nk FROM customer UNION SELECT s_nationkey AS nk FROM supplier
""",
)
def q_union_distinct(spark, sf_dir):
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return c.union(s).distinct()


@register(
    "q_intersect",
    oracle="""
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
INTERSECT
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
""",
)
def q_intersect(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    a = o.where(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey"))
    b = o.where(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    return a.intersect(b)


@register(
    "q_except",
    oracle="""
SELECT c_custkey AS custkey FROM customer
EXCEPT
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
""",
)
def q_except(spark, sf_dir):
    c = table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("custkey"))
    o = (
        table(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "O")
        .select(F.col("o_custkey").alias("custkey"))
    )
    return c.subtract(o)


@register(
    "q_string_funcs",
    oracle="""
SELECT c_custkey, upper(c_name) AS up, lower(c_mktsegment) AS lo,
       substr(c_name, 1, 8) AS sub, CAST(length(c_name) AS BIGINT) AS ln,
       c_name || '#' || c_mktsegment AS cat,
       replace(c_name, 'Customer', 'Cust') AS rep
FROM customer
""",
)
def q_string_funcs(spark, sf_dir):
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("up"),
        F.lower("c_mktsegment").alias("lo"),
        F.substring("c_name", 1, 8).alias("sub"),
        F.length("c_name").cast("long").alias("ln"),
        F.concat(F.col("c_name"), F.lit("#"), F.col("c_mktsegment")).alias("cat"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias("rep"),
    )


@register(
    "q_date_funcs",
    oracle="""
SELECT o_orderkey, CAST(year(o_orderdate) AS BIGINT) AS yr,
       CAST(month(o_orderdate) AS BIGINT) AS mo,
       CAST(day(o_orderdate) AS BIGINT) AS dom,
       CAST(date_trunc('month', o_orderdate) AS DATE) AS om,
       CAST(date_diff('day', DATE '1995-01-01', o_orderdate) AS BIGINT) AS dd
FROM orders
""",
)
def q_date_funcs(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("yr"),
        F.month("o_orderdate").cast("long").alias("mo"),
        F.dayofmonth("o_orderdate").cast("long").alias("dom"),
        F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("om"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01")).cast("long").alias("dd"),
    )


@register(
    "q_math_funcs",
    oracle="""
SELECT l_orderkey, l_linenumber,
       round(abs(l_discount - 0.05), 4) AS ad,
       round(l_quantity * l_quantity, 4) AS sq,
       round(sqrt(l_extendedprice), 4) AS sq_price,
       CAST(ceil(l_quantity) AS BIGINT) AS ce, CAST(floor(l_quantity) AS BIGINT) AS fl,
       CAST(l_orderkey % 7 AS BIGINT) AS md,
       CASE WHEN l_quantity > 25 THEN 'H' ELSE 'L' END AS cs
FROM lineitem
""",
)
def q_math_funcs(spark, sf_dir):
    l = table(spark, sf_dir, "lineitem")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        r4(F.abs(F.col("l_discount") - 0.05)).alias("ad"),
        r4(F.col("l_quantity") * F.col("l_quantity")).alias("sq"),
        r4(F.sqrt("l_extendedprice")).alias("sq_price"),
        F.ceil("l_quantity").cast("long").alias("ce"),
        F.floor("l_quantity").cast("long").alias("fl"),
        F.pmod(F.col("l_orderkey"), F.lit(7)).cast("long").alias("md"),
        F.when(F.col("l_quantity") > 25, "H").otherwise("L").alias("cs"),
    )


@register(
    "q_json_funcs",
    oracle="""
SELECT event_id, event_type,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
FROM events
""",
)
def q_json_funcs(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        "event_type",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    )


@register(
    "q_array_funcs",
    oracle="""
SELECT vec_id, CAST(len(embedding) AS BIGINT) AS dim, i AS pos,
       round(CAST(embedding[CAST(i + 1 AS INT)] AS DOUBLE), 4) AS val
FROM embeddings, range(8) t(i)
""",
)
def q_array_funcs(spark, sf_dir):
    em = table(spark, sf_dir, "embeddings")
    return em.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.posexplode(F.slice("embedding", 1, 8)),
    ).select(
        "vec_id",
        "dim",
        F.col("pos").cast("long").alias("pos"),
        r4(F.col("col").cast("double")).alias("val"),
    )
