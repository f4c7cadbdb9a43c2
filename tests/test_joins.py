"""Scale-path join strategies: salted-join equivalence + skew spread,
bucketed tables joining without a shuffle, connector poll loop."""

import pyspark.sql.functions as F
import pytest

from pulsar_io_delta_spark.operators.joins import (
    asof_join,
    bucketed_join_is_shuffle_free,
    salted_join,
    write_bucketed,
)
from pulsar_io_delta_spark.tables import table


def test_salted_join_matches_plain_join(spark, sf_dir):
    l = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    plain = l.join(o, "l_orderkey")
    salted = salted_join(l, o, "l_orderkey", salt=4)
    assert salted.count() == plain.count()
    a = {tuple(r) for r in plain.collect()}
    b = {tuple(r) for r in salted.collect()}
    assert a == b


def test_salted_join_spreads_hot_key(spark):
    """A degenerate key (100% of rows) lands on `salt` distinct
    sub-keys instead of one reducer."""
    hot = spark.range(10_000).select(F.lit(1).alias("k"), F.col("id"))
    dim = spark.createDataFrame([(1, "x")], ["k", "v"])
    s = hot.withColumn("_salt_l", (F.rand(seed=42) * 8).cast("int"))
    spread = s.select("_salt_l").distinct().count()
    assert spread == 8
    out = salted_join(hot, dim, "k", salt=8)
    assert out.count() == 10_000
    assert out.columns == ["k", "id", "v"]


def test_salted_left_join_keeps_unmatched(spark):
    left = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "lv"])
    right = spark.createDataFrame([(1, "x")], ["k", "rv"])
    out = salted_join(left, right, "k", salt=4, how="left").collect()
    assert len(out) == 2
    assert {(r.k, r.rv) for r in out} == {(1, "x"), (2, None)}


@pytest.mark.usefixtures("spark")
def test_bucketed_join_no_shuffle(spark, sf_dir):
    # uses the session's default warehouse dir (spark-warehouse/, gitignored)
    l = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    write_bucketed(l, "b_lineitem", "l_orderkey", num_buckets=8)
    write_bucketed(o, "b_orders", "l_orderkey", num_buckets=8)
    try:
        assert bucketed_join_is_shuffle_free(spark, "b_lineitem", "b_orders", "l_orderkey")
        joined = spark.table("b_lineitem").join(spark.table("b_orders"), "l_orderkey")
        assert joined.count() == l.join(o, "l_orderkey").count()
    finally:
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        spark.sql("DROP TABLE IF EXISTS b_orders")


def test_asof_join_semantics(spark):
    from pulsar_io_delta_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(1, 100, "p1"), (1, 200, "p2"), (2, 50, "p3")], "k int, ts long, pid string"
    ).select("k", F.col("ts"), "pid")
    right = spark.createDataFrame(
        [(1, 90, "c1"), (1, 150, "c2"), (1, 200, "c3"), (2, 60, "c4")],
        "k int, rts long, cid string",
    )
    out = {
        r.pid: r.cid
        for r in asof_join(
            left, right, on="k", left_ts="ts", right_ts="rts", right_cols=["cid", "rts"]
        ).collect()
    }
    assert out["p1"] == "c1"  # most recent prior
    assert out["p2"] == "c3"  # equal timestamp counts (<= semantics)
    assert out["p3"] is None  # no prior right row → null (left semantics)


def test_connector_poll_loop(spark, tmp_path):
    from pulsar_io_delta_spark.connector import (
        Checkpoint,
        ConnectorConfig,
        DeltaCdcConnector,
        INCREMENTAL_COPY,
    )
    from pulsar_io_delta_spark.sources.delta_log import DeltaTable

    path = str(tmp_path / "tbl")
    t = DeltaTable(path)
    mk = lambda lo, hi: spark.range(lo, hi).select(  # noqa: E731
        F.col("id").alias("event_id"), F.lit("click").alias("event_type")
    )
    t.write(mk(0, 10))
    cfg = ConnectorConfig.load({"tablePath": path, "includeHistoryData": True})
    conn = DeltaCdcConnector(cfg)
    batches = []
    cursor = conn.run(spark, lambda df: batches.append(df.count()), max_polls=1)
    assert batches == [10]  # bootstrap; no new commits to poll
    # new commits arrive; poll picks up exactly the delta
    t.write(mk(10, 15))
    t.write(mk(15, 17))
    df, cursor2 = conn.poll(spark, cursor)
    assert df is not None and df.count() == 7
    assert cursor2.snapshot_version == 2 and cursor2.state == INCREMENTAL_COPY
    # idle poll: no new data, cursor unchanged
    df3, cursor3 = conn.poll(spark, cursor2)
    assert df3 is None and cursor3 == cursor2


def test_salted_join_rejects_outer_modes(spark):
    df = spark.range(5).withColumnRenamed("id", "k")
    with pytest.raises(ValueError, match="salted_join supports"):
        salted_join(df, df, "k", how="full")
    with pytest.raises(ValueError, match="salted_join supports"):
        salted_join(df, df, "k", how="right")


def test_asof_null_key_passes_through(spark):
    left = spark.createDataFrame(
        [(None, 10, "a"), ("k1", 10, "b")], "k string, ts int, tag string"
    )
    right = spark.createDataFrame(
        [(None, 5, 1.0), ("k1", 5, 2.0)], "k string, ts int, v double"
    )
    out = {
        (r.tag, r.v)
        for r in asof_join(left, right, "k", "ts", "ts", ["v"]).collect()
    }
    # null keys never match — even though a null-keyed right row exists
    assert out == {("a", None), ("b", 2.0)}


def test_asof_carries_whole_row_not_stitched_columns(spark):
    left = spark.createDataFrame([("k1", 30, "x")], "k string, ts int, tag string")
    right = spark.createDataFrame(
        [("k1", 10, 1.0, "old"), ("k1", 20, None, "new")],
        "k string, ts int, v double, label string",
    )
    row = asof_join(left, right, "k", "ts", "ts", ["v", "label"]).first()
    # the match is the ts=20 row as a whole: v stays NULL, never
    # backfilled from the ts=10 row
    assert row.label == "new" and row.v is None


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    """The co-location contract: both sides bucketed (8, orderkey) +
    in-bucket sorted, so the sort-merge join plans with ZERO Exchange
    (broadcast disabled to force the join strategy a 100 TB fact-fact
    join would use). The write-time shuffle is the amortized cost."""
    from pulsar_io_delta_spark.queries.relational3 import q_join_bucketed

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = q_join_bucketed(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "SortMergeJoin" in plan, plan
    # the ONLY exchange allowed is the final single-partition/agg one;
    # the join itself must read buckets directly
    join_part = plan.split("SortMergeJoin", 1)[1]
    assert "Exchange" not in join_part, plan
    assert "SelectedBucketsCount: 8 out of 8" in plan, plan
