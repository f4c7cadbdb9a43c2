"""Second relational coverage batch: multiset set-ops, moment-based
exact variance, cross join, null-handling scalars, regex scalars,
struct construction/access.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pulsar_io_delta_spark.queries._util import dsum, r4
from pulsar_io_delta_spark.registry import register
from pulsar_io_delta_spark.tables import table


@register(
    "q_intersect_all",
    oracle="""
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
INTERSECT ALL
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
""",
)
def q_intersect_all(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    a = o.where(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey"))
    b = o.where(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    return a.intersectAll(b)


@register(
    "q_except_all",
    oracle="""
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
EXCEPT ALL
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
""",
)
def q_except_all(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    a = o.where(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey"))
    b = o.where(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    return a.exceptAll(b)


@register(
    "q_agg_variance",
    oracle="""
SELECT l_returnflag, count(*) AS n,
       round((CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(24,8))) AS DOUBLE)
              - CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
                * CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(*))
             / (count(*) - 1), 4) AS var_qty
FROM lineitem GROUP BY l_returnflag
""",
)
def q_agg_variance(spark, sf_dir):
    """Sample variance from exact decimal moments: sum and sum-of-squares
    are order-independent decimals, so the derived double is
    engine-identical — the deterministic alternative to var_samp's
    order-dependent streaming accumulation."""
    l = table(spark, sf_dir, "lineitem")
    s1 = dsum("l_quantity", "18,4")
    s2 = dsum(F.col("l_quantity") * F.col("l_quantity"), "24,8")
    n = F.count("*")
    return l.groupBy("l_returnflag").agg(
        n.alias("n"), r4((s2 - s1 * s1 / n) / (n - 1)).alias("var_qty")
    )


@register(
    "q_join_cross",
    oracle="""
SELECT r_name, n_name FROM region CROSS JOIN nation
""",
)
def q_join_cross(spark, sf_dir):
    r = table(spark, sf_dir, "region")
    n = table(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name")


@register(
    "q_null_funcs",
    oracle=f"""
SELECT c_custkey,
       coalesce(o_orderkey, -1) AS ok,
       CASE WHEN o_orderkey IS NULL THEN 'none' ELSE 'some' END AS has_order,
       nullif(c_mktsegment, 'BUILDING') AS seg_nb,
       ifnull(o_totalprice, 0.0) AS price0
FROM customer LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 400000.0) o
  ON c_custkey = o_custkey
""",
)
def q_null_funcs(spark, sf_dir):
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 400000.0)
    j = c.join(o, c.c_custkey == o.o_custkey, "left")
    return j.select(
        "c_custkey",
        F.coalesce(F.col("o_orderkey"), F.lit(-1)).alias("ok"),
        F.when(F.col("o_orderkey").isNull(), "none").otherwise("some").alias("has_order"),
        F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg_nb"),
        F.ifnull(F.col("o_totalprice"), F.lit(0.0)).alias("price0"),
    )


@register(
    "q_regex_funcs",
    oracle="""
SELECT p_partkey,
       regexp_extract(p_type, '^([a-z]+)', 1) AS first_word,
       regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
       CASE WHEN regexp_matches(p_brand, '#[0-9]+$') THEN 1 ELSE 0 END AS brand_ok
FROM part
""",
)
def q_regex_funcs(spark, sf_dir):
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract(F.col("p_type"), "^([a-z]+)", 1).alias("first_word"),
        F.regexp_replace(F.col("p_name"), "[aeiou]", "_").alias("devoweled"),
        F.when(F.col("p_brand").rlike("#[0-9]+$"), 1).otherwise(0).alias("brand_ok"),
    )


@register(
    "q_struct_funcs",
    oracle="""
SELECT o_orderkey,
       struct_pack(k := o_custkey, p := o_totalprice).k AS sk,
       struct_pack(k := o_custkey, p := o_totalprice).p AS sp
FROM orders
""",
)
def q_struct_funcs(spark, sf_dir):
    """Struct construction + field access (nested types the reference
    can only stringify — SURVEY §1.3); output re-flattened to scalars
    for engine-portable hashing."""
    o = table(spark, sf_dir, "orders")
    s = F.struct(F.col("o_custkey").alias("k"), F.col("o_totalprice").alias("p"))
    return o.select(
        "o_orderkey", s.getField("k").alias("sk"), s.getField("p").alias("sp")
    )
