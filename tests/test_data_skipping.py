"""File-stats data skipping: footer min/max collected at write time,
files pruned at read time, results still exact."""

import pyspark.sql.functions as F

from pulsar_io_delta_spark.sources.delta_log import DeltaTable


def _commit_ranges(spark, path, ranges):
    t = DeltaTable(path)
    for lo, hi in ranges:
        df = spark.range(lo, hi).select(
            F.col("id").alias("event_id"), (F.col("id") * 2.0).alias("value")
        )
        t.write(df.coalesce(1))
    return t


def test_stats_collected_on_write(spark, tmp_path):
    t = _commit_ranges(spark, str(tmp_path / "t"), [(0, 100)])
    import json

    add = next(iter(t.snapshot().adds.values()))
    stats = json.loads(add["stats"])
    assert stats["numRecords"] == 100
    assert stats["minValues"]["event_id"] == 0
    assert stats["maxValues"]["event_id"] == 99


def test_pruning_skips_files_and_stays_exact(spark, tmp_path):
    # 4 commits covering disjoint id ranges → 4 single-file ranges
    t = _commit_ranges(
        spark, str(tmp_path / "t2"), [(0, 100), (100, 200), (200, 300), (300, 400)]
    )
    snap = t.snapshot()
    assert len(snap.files) == 4
    kept = t.prune_files(snap, [("event_id", ">=", 250)])
    assert len(kept) == 2  # only the [200,300) and [300,400) files
    df = t.read(spark, filters=[("event_id", ">=", 250)])
    assert df.count() == 150
    assert df.agg(F.min("event_id")).first()[0] == 250


def test_pruning_equality_and_partition_values(spark, tmp_path):
    t = DeltaTable(str(tmp_path / "t3"))
    df = spark.range(100).select(
        F.col("id").alias("event_id"),
        F.when(F.col("id") % 2 == 0, "click").otherwise("buy").alias("event_type"),
    )
    t.write(df, partition_by=["event_type"])
    snap = t.snapshot()
    kept = t.prune_files(snap, [("event_type", "=", "buy")])
    assert 0 < len(kept) < len(snap.files)
    out = t.read(spark, filters=[("event_type", "=", "buy")])
    assert out.count() == 50


def test_pruning_survives_checkpoint(spark, tmp_path):
    t = _commit_ranges(spark, str(tmp_path / "t4"), [(0, 100), (100, 200)])
    t.checkpoint()
    t.expire_log()
    snap = t.snapshot()
    kept = t.prune_files(snap, [("event_id", "<", 50)])
    assert len(kept) == 1
    assert t.read(spark, filters=[("event_id", "<", 50)]).count() == 50
