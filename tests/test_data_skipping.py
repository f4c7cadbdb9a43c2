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


def test_string_stats_truncated_and_sound(spark, tmp_path):
    """Long string columns keep only a 32-char stats prefix (a 1 KB
    text would otherwise land ~2 KB in EVERY add action — GBs of log
    at 10^6 files). Truncation must stay SOUND: min prefix <= true
    min, max gets its last char bumped >= true max, and pruning on the
    column still never drops a matching file."""
    import json

    from pulsar_io_delta_spark.sources.delta_log import _truncated_string_max

    t = DeltaTable(str(tmp_path / "s"))
    rows = [
        (0, "aaaa" + "x" * 500),
        (1, "mmmm" + "y" * 500),
    ]
    t.write(spark.createDataFrame(rows, "doc_id long, text string").coalesce(1))
    t.write(
        spark.createDataFrame(
            [(2, "zzzz" + "z" * 500)], "doc_id long, text string"
        ).coalesce(1)
    )
    snap = t.snapshot()
    for p in snap.files:
        s = json.loads(snap.adds[p]["stats"])
        assert len(s["minValues"]["text"]) <= 32
        assert len(s["maxValues"]["text"]) <= 32
    # bounds sound: the bumped max is > any value sharing the prefix
    assert _truncated_string_max("a" * 100) == "a" * 31 + "b"
    assert _truncated_string_max("short") == "short"
    assert _truncated_string_max(chr(0x10FFFF) * 40) is None
    # pruning stays exact on the truncated column
    kept = t.prune_files(snap, [("text", ">=", "zzz")])
    hit = t.read(spark, filters=[("text", ">=", "zzz")])
    assert hit.count() == 1 and len(kept) >= 1
    assert t.read(spark, filters=[("text", "<", "b")]).count() == 1
