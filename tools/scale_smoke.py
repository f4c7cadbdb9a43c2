"""Scale smoke: run headline operator shapes on a 16× blow-up of
lineitem (~9.6M rows from sf0.1) and report wall times + per-row cost
vs the 1× run. The point is not absolute speed but *flat per-row cost*
and no driver-side blow-ups as data grows — evidence for the
"would this survive 100×?" question.

Usage: python tools/scale_smoke.py [multiplier]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F  # noqa: E402

from pulsar_io_delta_spark.session import get_spark  # noqa: E402
from pulsar_io_delta_spark.tables import table  # noqa: E402


def blow_up(df, k: int):
    """k× the rows with perturbed keys (keeps key cardinality growing —
    a pure duplicate would make joins quadratically heavier than real
    data growth)."""
    reps = F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("_rep")
    out = df.select("*", reps)
    return out.withColumn(
        "l_orderkey", F.col("l_orderkey") + F.col("_rep") * 10_000_000
    ).drop("_rep")


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    sf = "/root/testdata/sf0.1"
    spark = get_spark(app_name="scale-smoke")
    spark.sparkContext.setLogLevel("ERROR")
    l1 = table(spark, sf, "lineitem")
    o = table(spark, sf, "orders")

    def q1(l):
        disc_price = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
        return (
            l.where(F.col("l_shipdate") <= "2000-09-02")
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("sq"),
                F.sum(disc_price.cast("decimal(24,6)")).alias("sd"),
                F.count("*").alias("c"),
            )
        )

    def join_agg(l):
        return (
            l.join(o, l.l_orderkey % 10_000_000 == o.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("cnt"))
        )

    def topk(l):
        return l.orderBy(F.desc("l_extendedprice"), "l_orderkey", "l_linenumber").limit(100)

    shapes = {"q1_agg": q1, "join_agg": join_agg, "topk": topk}
    for name, fn in shapes.items():
        for label, df, rows in (("1x", l1, 600_000), (f"{k}x", blow_up(l1, k), 600_000 * k)):
            fn(df).write.mode("overwrite").format("noop").save()  # warm
            t0 = time.time()
            fn(df).write.mode("overwrite").format("noop").save()
            dt = time.time() - t0
            print(f"{name:10s} {label:4s} rows={rows:>9,d} wall={dt:6.2f}s ns/row={dt/rows*1e9:7.1f}")
    spark.stop()


if __name__ == "__main__":
    main()
