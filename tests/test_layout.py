"""Clustered layout makes data skipping effective; random layout doesn't."""

import pyspark.sql.functions as F

from pulsar_io_delta_spark.operators.layout import skipping_ratio, write_clustered
from pulsar_io_delta_spark.sources.delta_log import DeltaTable
from pulsar_io_delta_spark.tables import table


def test_clustered_layout_skips_random_does_not(spark, sf_dir, tmp_path):
    ev = table(spark, sf_dir, "events").select("event_id", "ts", "user_id", "value")
    filters = [("event_id", ">=", 900)]  # top 10% of ids

    rand_t = DeltaTable(str(tmp_path / "rand"))
    # shuffle-random layout: every file spans nearly the full id range
    rand_t.write(ev.repartition(8))
    clus_t = DeltaTable(str(tmp_path / "clus"))
    write_clustered(clus_t, ev, "event_id", num_files=8)

    r_rand = skipping_ratio(rand_t, filters)
    r_clus = skipping_ratio(clus_t, filters)
    assert r_rand == 0.0  # nothing skippable
    assert r_clus >= 0.75  # ≥6 of 8 files skipped

    # correctness unchanged by layout
    expected = ev.where("event_id >= 900").count()
    assert clus_t.read(spark, filters=filters).count() == expected
    assert rand_t.read(spark, filters=filters).count() == expected


def test_clustered_timestamps(spark, sf_dir, tmp_path):
    ev = table(spark, sf_dir, "events").select("event_id", "ts", "value")
    t = DeltaTable(str(tmp_path / "byts"))
    write_clustered(t, ev.withColumn("ts_epoch", F.unix_timestamp("ts")), "ts_epoch", 8)
    cut = ev.agg(F.expr("percentile_approx(unix_timestamp(ts), 0.9)")).first()[0]
    ratio = skipping_ratio(t, [("ts_epoch", ">=", int(cut))])
    assert ratio >= 0.75


def test_zorder_skips_on_both_dimensions(spark, tmp_path):
    from pulsar_io_delta_spark.operators.layout import write_zordered

    df = spark.range(40_000).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 200).cast("double").alias("user_id"),
        (F.floor(F.col("id") / 200)).cast("double").alias("value"),
    )
    # random layout: every file spans the full range on both columns
    rnd = DeltaTable(str(tmp_path / "rnd"))
    rnd.write(df.repartition(16))
    # z-ordered: files cover compact (user_id, value) tiles
    zo = DeltaTable(str(tmp_path / "zo"))
    write_zordered(zo, df, "user_id", "value", num_files=16)

    box = [("user_id", ">=", 0.0), ("user_id", "<", 25.0),
           ("value", ">=", 0.0), ("value", "<", 25.0)]
    r_rnd = skipping_ratio(rnd, box)
    r_zo = skipping_ratio(zo, box)
    assert r_rnd == 0.0          # nothing prunable
    assert r_zo >= 0.5           # most tiles outside the box are skipped
    # correctness unaffected by layout
    a = zo.read(spark, filters=box).count()
    b = rnd.read(spark, filters=box).count()
    assert a == b > 0


def test_bucketed_join_plans_no_exchange(spark, sf_dir, tmp_path):
    """Two tables bucketed identically on the join key sort-merge-join
    with ZERO exchanges: the shuffle is paid once at write time — the
    co-located fact-fact join layout for 100 TB (PERF.md)."""
    from pulsar_io_delta_spark.operators.layout import bucketed_join, write_bucketed

    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    od = table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    write_bucketed(li, "bkt_lineitem", str(tmp_path / "bl"), "l_orderkey", 8)
    write_bucketed(od, "bkt_orders", str(tmp_path / "bo"), "l_orderkey", 8)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "bkt_lineitem", "bkt_orders", "l_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan
        # correctness: same count as the plain shuffled join
        expected = li.join(od, "l_orderkey").count()
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bkt_lineitem")
        spark.sql("DROP TABLE IF EXISTS bkt_orders")
