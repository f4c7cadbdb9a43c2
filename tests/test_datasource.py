"""pulsar_delta_cdc Python DataSource: batch/stream reads, exactly-once
restart, agreement with the DeltaTable.cdc DataFrame path."""

import os

import pyspark.sql.functions as F
import pytest

from pulsar_io_delta_spark.sources.datasource import register_delta_cdc
from pulsar_io_delta_spark.sources.delta_log import DeltaTable


@pytest.fixture()
def cdc_table(spark, tmp_path):
    path = str(tmp_path / "tbl")
    t = DeltaTable(path)
    mk = lambda lo, hi, et: spark.range(lo, hi).select(  # noqa: E731
        F.col("id").alias("event_id"),
        F.lit(et).alias("event_type"),
        (F.col("id") * 1.5).alias("value"),
    )
    t.write(mk(0, 10, "click"), partition_by=["event_type"])
    t.write(mk(10, 14, "buy"), partition_by=["event_type"])
    t.delete_where(spark, "event_type = 'buy'")
    register_delta_cdc(spark)
    return path


def test_batch_read_matches_cdc(spark, cdc_table):
    ds = (
        spark.read.format("pulsar_delta_cdc")
        .option("tablePath", cdc_table)
        .option("startingVersion", 0)
        .load()
    )
    ref = DeltaTable(cdc_table).cdc(spark, start_version=0)
    a = {(r.event_id, r.op, r.partition_value, r._commit_version) for r in ds.collect()}
    b = {(r.event_id, r.op, r.partition_value, r._commit_version) for r in ref.collect()}
    assert a == b and len(a) > 0


def test_batch_version_bounds(spark, cdc_table):
    ds = (
        spark.read.format("pulsar_delta_cdc")
        .option("tablePath", cdc_table)
        .option("startingVersion", 1)
        .option("endingVersion", 1)
        .load()
    )
    assert {r._commit_version for r in ds.select("_commit_version").collect()} == {1}


def test_envelope_and_pushdown_columns(spark, cdc_table):
    ds = spark.read.format("pulsar_delta_cdc").option("tablePath", cdc_table).load()
    assert {"op", "partition_value", "ts", "_commit_version"} <= set(ds.columns)
    ops = {r.op for r in ds.select("op").distinct().collect()}
    assert ops == {"c", "r"}
    pvs = {r.partition_value for r in ds.select("partition_value").distinct().collect()}
    assert pvs == {"event_type=click", "event_type=buy"}


def test_batch_write_through_datasource(spark, tmp_path):
    register_delta_cdc(spark)
    path = str(tmp_path / "w1")
    src = spark.range(20).select(
        F.col("id").alias("event_id"),
        F.when(F.col("id") % 2 == 0, "click").otherwise("buy").alias("event_type"),
    )
    (
        src.write.format("pulsar_delta_cdc")
        .option("tablePath", path)
        .option("partitionBy", "event_type")
        .mode("append")
        .save()
    )
    t = DeltaTable(path)
    assert t.read(spark).count() == 20
    assert t.snapshot().partition_columns == ["event_type"]
    assert {r.event_type for r in t.read(spark).select("event_type").distinct().collect()} == {
        "click",
        "buy",
    }


def test_stream_write_exactly_once(spark, tmp_path):
    register_delta_cdc(spark)
    path, ck = str(tmp_path / "w2"), str(tmp_path / "ck2")
    src_dir = str(tmp_path / "in")
    spark.range(50).select(F.col("id").alias("event_id")).coalesce(2).write.parquet(src_dir)

    def run():
        q = (
            spark.readStream.schema("event_id long")
            .parquet(src_dir)
            .writeStream.format("pulsar_delta_cdc")
            .option("tablePath", path)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(180)

    run()
    assert DeltaTable(path).read(spark).count() == 50
    run()  # restart without new input: txn marker suppresses re-commit
    assert DeltaTable(path).read(spark).count() == 50


def test_stream_exactly_once_restart(spark, cdc_table, tmp_path):
    ck = str(tmp_path / "ck")
    counts = []

    def run():
        q = (
            spark.readStream.format("pulsar_delta_cdc")
            .option("tablePath", cdc_table)
            .load()
            .writeStream.foreachBatch(lambda b, _i: counts.append(b.count()))
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(180)

    run()
    total_first = sum(counts)
    assert total_first == DeltaTable(cdc_table).cdc(spark, 0).count()
    run()  # no new commits → no duplicate delivery
    assert sum(counts) == total_first
    DeltaTable(cdc_table).write(
        spark.range(100, 103).select(
            F.col("id").alias("event_id"),
            F.lit("click").alias("event_type"),
            (F.col("id") * 1.5).alias("value"),
        ),
        partition_by=["event_type"],
    )
    run()
    assert sum(counts) == total_first + 3


def test_compact_invisible_through_datasource(spark, cdc_table):
    before = (
        spark.read.format("pulsar_delta_cdc")
        .option("tablePath", cdc_table)
        .load()
        .count()
    )
    DeltaTable(cdc_table).compact(spark)
    after_df = spark.read.format("pulsar_delta_cdc").option("tablePath", cdc_table).load()
    assert after_df.count() == before
    compact_v = DeltaTable(cdc_table).latest_version()
    assert after_df.filter(F.col("_commit_version") == compact_v).count() == 0


def test_stream_max_versions_per_trigger(spark, tmp_path):
    register_delta_cdc(spark)
    path, ck = str(tmp_path / "rl"), str(tmp_path / "ck_rl")
    t = DeltaTable(path)
    for lo in range(0, 25, 5):  # 5 commits of 5 rows each
        t.write(
            spark.range(lo, lo + 5).select(
                F.col("id").alias("event_id"), F.lit("click").alias("event_type")
            ),
            partition_by=["event_type"],
        )
    batches = []

    def sink(b, _i):
        rows = b.select("event_id", "_commit_version").collect()
        if rows:
            batches.append(rows)

    # availableNow captures one target offset up front (no per-batch
    # admission for Python sources), so drive ordinary micro-batches.
    q = (
        spark.readStream.format("pulsar_delta_cdc")
        .option("tablePath", path)
        .option("maxVersionsPerTrigger", 2)
        .load()
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ck)
        .trigger(processingTime="1 second")
        .start()
    )
    import time

    deadline = time.time() + 180
    while time.time() < deadline and sum(len(b) for b in batches) < 25:
        time.sleep(1)
    q.stop()
    assert len(batches) >= 3  # 5 versions / 2 per trigger
    seen = [r.event_id for b in batches for r in b]
    assert sorted(seen) == list(range(25))  # exactly-once, no overlap
    for b in batches:
        assert len({r._commit_version for r in b}) <= 2


@pytest.fixture()
def cdf_table(spark, tmp_path):
    """A CDF-armed table with an append (derived), a merge (cdc files
    with pre/post images) and a DV delete (cdc files)."""
    path = str(tmp_path / "cdf_tbl")
    t = DeltaTable(path)
    mk = lambda lo, hi: spark.range(lo, hi).select(  # noqa: E731
        F.col("id").alias("event_id"),
        (F.col("id") * 1.5).alias("value"),
    )
    t.write(mk(0, 8).coalesce(1),
            configuration={"delta.enableChangeDataFeed": "true"})   # v0
    src = spark.createDataFrame(
        [(2, 200.0), (99, 99.0)], "event_id long, value double"
    )
    t.merge_upsert(spark, src, key_cols=["event_id"])               # v1
    t.delete_where_dv(spark, "event_id = 5")                        # v2
    register_delta_cdc(spark)
    return path


def test_batch_read_change_feed(spark, cdf_table):
    ds = (
        spark.read.format("pulsar_delta_cdc")
        .option("tablePath", cdf_table)
        .option("readChangeFeed", "true")
        .option("startingVersion", 0)
        .load()
    )
    assert "_change_type" in ds.columns and "op" not in ds.columns
    by = {}
    for r in ds.collect():
        by.setdefault(r["_change_type"], set()).add((r.event_id, r.value))
    assert by["update_preimage"] == {(2, 3.0)}
    assert by["update_postimage"] == {(2, 200.0)}
    assert by["delete"] == {(5, 7.5)}
    assert {(99, 99.0)} <= by["insert"]          # merge insert (cdc file)
    assert {(0, 0.0), (1, 1.5)} <= by["insert"]  # v0 append (derived)
    # agreement with the DataFrame CDF path
    ref = DeltaTable(cdf_table).table_changes(spark, start_version=0)
    a = {(r.event_id, r.value, r["_change_type"], r["_commit_version"])
         for r in ds.collect()}
    b = {(r.event_id, r.value, r["_change_type"], r["_commit_version"])
         for r in ref.collect()}
    assert a == b


def test_stream_read_change_feed(spark, cdf_table, tmp_path):
    rows = []

    def sink(b, _i):
        rows.extend(b.select("event_id", "_change_type", "_commit_version").collect())

    q = (
        spark.readStream.format("pulsar_delta_cdc")
        .option("tablePath", cdf_table)
        .option("readChangeFeed", "true")
        .option("stopAfterVersion", 2)
        .load()
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ck_cdf"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {(r.event_id, r["_change_type"]) for r in rows}
    assert (2, "update_preimage") in got and (2, "update_postimage") in got
    assert (5, "delete") in got
    assert {r["_commit_version"] for r in rows} == {0, 1, 2}


def test_derived_dv_slice_refuses_loudly(spark, tmp_path):
    """Without CDF, a DV-carrying add cannot be derived by the arrow
    whole-file reader — loud error, never resurrected rows."""
    path = str(tmp_path / "dv_tbl")
    t = DeltaTable(path)
    t.write(
        spark.range(6).select(F.col("id").alias("event_id")).coalesce(1)
    )
    t.delete_where_dv(spark, "event_id = 0")
    register_delta_cdc(spark)
    ds = spark.read.format("pulsar_delta_cdc").option("tablePath", path).load()
    with pytest.raises(Exception, match="deletion-vector"):
        ds.collect()


def test_mapped_table_refused_by_datasource(spark, tmp_path):
    path = str(tmp_path / "cm_tbl")
    t = DeltaTable(path)
    t.write(spark.range(3).select(F.col("id").alias("event_id")))
    t.enable_column_mapping()
    register_delta_cdc(spark)
    with pytest.raises(Exception, match="column-mapped"):
        spark.read.format("pulsar_delta_cdc").option("tablePath", path).load().collect()
