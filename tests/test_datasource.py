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


# ---------------------------------------------------------------------------
# File/byte-granular admission (maxFilesPerTrigger / maxBytesPerTrigger):
# sub-commit offsets {"version": v, "index": i} split WITHIN a commit, so
# one huge commit drains as bounded micro-batches. Offset math is pinned
# by driving the planner directly (deterministic, no engine clock).


def _stream_reader(path, **opts):
    from pulsar_io_delta_spark.sources.datasource import _CdcStreamReader

    return _CdcStreamReader(None, {"tablePath": path, **{k: str(v) for k, v in opts.items()}})


@pytest.fixture()
def two_commit_table(spark, tmp_path):
    path = str(tmp_path / "mft")
    t = DeltaTable(path)
    ids = spark.range(8).select(F.col("id").alias("event_id"))
    t.write(ids.repartition(4))            # v0: 4 files, 2 rows each
    t.write(ids.limit(4).repartition(2))   # v1: 2 files
    return path


def test_max_files_splits_within_a_commit(two_commit_table):
    r = _stream_reader(two_commit_table, maxFilesPerTrigger=3)
    o0 = r.initialOffset()
    assert o0 == {"version": 0, "index": 0}
    o1 = r.latestOffset()
    assert o1 == {"version": 0, "index": 3}  # mid-commit
    p1 = r.partitions(o0, o1)
    assert [s.version for s in p1] == [0, 0, 0]
    o2 = r.latestOffset()  # 1 leftover of v0 + both of v1
    assert o2 == {"version": 2, "index": 0}
    p2 = r.partitions(o1, o2)
    assert [s.version for s in p2] == [0, 1, 1]
    # no new commits: offset holds, zero partitions
    o3 = r.latestOffset()
    assert o3 == o2 and r.partitions(o2, o3) == []
    # exactly-once across the split: every file slice seen exactly once
    seen = [(s.version, s.rel_path) for s in p1 + p2]
    assert len(seen) == len(set(seen)) == 6


def test_max_bytes_admits_at_least_one_slice(two_commit_table):
    # every file is bigger than 1 byte → soft cap admits exactly one
    # slice per trigger, and the stream still progresses
    r = _stream_reader(two_commit_table, maxBytesPerTrigger=1)
    offsets = [r.initialOffset()]
    for _ in range(6):
        offsets.append(r.latestOffset())
    for a, b in zip(offsets, offsets[1:]):
        assert len(r.partitions(a, b)) == 1
    assert offsets[-1] == {"version": 2, "index": 0}


def test_max_bytes_packs_by_log_size(two_commit_table):
    from pulsar_io_delta_spark.sources.datasource import _plan_slices

    sizes = [s.size for s in _plan_slices(two_commit_table, 0, 0)]
    assert all(sz > 0 for sz in sizes)
    # budget for exactly the first two v0 files
    r = _stream_reader(two_commit_table, maxBytesPerTrigger=sizes[0] + sizes[1])
    r.initialOffset()
    assert r.latestOffset() == {"version": 0, "index": 2}


def test_restart_resumes_mid_commit(two_commit_table):
    # a fresh planner (post-restart) re-seeded from the checkpointed
    # offset continues from the sub-commit position, no overlap
    r = _stream_reader(two_commit_table, maxFilesPerTrigger=10)
    r.commit({"version": 0, "index": 2})
    o = r.latestOffset()
    assert o == {"version": 2, "index": 0}
    parts = r.partitions({"version": 0, "index": 2}, o)
    assert [s.version for s in parts] == [0, 0, 1, 1]
    # legacy checkpoint form (no index key) still resolves
    assert len(r.partitions({"version": 0}, {"version": 2})) == 6


def test_caps_compose_with_max_versions(two_commit_table):
    # version cap bounds the walk even when the file budget is larger
    r = _stream_reader(
        two_commit_table, maxFilesPerTrigger=100, maxVersionsPerTrigger=1
    )
    r.initialOffset()
    assert r.latestOffset() == {"version": 1, "index": 0}


def test_stream_max_files_per_trigger_end_to_end(spark, two_commit_table, tmp_path):
    register_delta_cdc(spark)
    batches = []

    def sink(b, _i):
        rows = b.select("event_id", "_commit_version").collect()
        if rows:
            batches.append(rows)

    q = (
        spark.readStream.format("pulsar_delta_cdc")
        .option("tablePath", two_commit_table)
        .option("maxFilesPerTrigger", 1)
        .load()
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ck_mft"))
        .trigger(processingTime="1 second")
        .start()
    )
    import time

    deadline = time.time() + 180
    while time.time() < deadline and sum(len(b) for b in batches) < 12:
        time.sleep(1)
    q.stop()
    assert sum(len(b) for b in batches) == 12  # 8 (v0) + 4 (v1), exactly once
    assert len(batches) == 6  # one file slice per micro-batch
    for b in batches:
        assert len({(r._commit_version) for r in b}) == 1


# ---------------------------------------------------------------------------
# Batch filter pushdown (Spark 4.1 Python DataSource API): comparison
# filters prune file slices via log partitionValues + footer stats before
# any parquet opens; _commit_version bounds shrink the version walk. All
# filters are returned for post-scan re-evaluation, so results are exact.


def _batch_reader(path, **opts):
    from pulsar_io_delta_spark.sources.datasource import _CdcBatchReader

    return _CdcBatchReader(
        None, {"tablePath": path, **{k: str(v) for k, v in opts.items()}}
    )


@pytest.fixture()
def pruned_table(spark, tmp_path):
    path = str(tmp_path / "pr")
    t = DeltaTable(path)
    df = spark.range(100).select(
        F.col("id").alias("event_id"),
        F.when(F.col("id") % 2 == 0, "click").otherwise("view").alias("event_type"),
    )
    t.write(df.coalesce(1), partition_by=["event_type"])            # v0: 2 files
    t.write(df.limit(10).coalesce(1), partition_by=["event_type"])  # v1: 2 files
    return path


def test_pushdown_prunes_by_partition_value(spark, pruned_table):
    from pyspark.sql.datasource import EqualTo

    r = _batch_reader(pruned_table)
    remaining = list(r.pushFilters([EqualTo(("event_type",), "click")]))
    assert len(remaining) == 1  # everything re-evaluated by Spark
    parts = r.partitions()
    assert len(parts) == 2  # click file per commit; view files pruned
    assert all(dict(p.partition_values)["event_type"] == "click" for p in parts)


def test_pushdown_prunes_by_footer_stats(spark, pruned_table):
    from pyspark.sql.datasource import GreaterThan

    r = _batch_reader(pruned_table)
    list(r.pushFilters([GreaterThan(("event_id",), 50)]))
    parts = r.partitions()
    # v1's files hold event_id 0..9 only — their max stats exclude them
    assert all(p.version == 0 for p in parts)


def test_pushdown_bounds_version_walk(spark, pruned_table):
    from pyspark.sql.datasource import EqualTo, LessThanOrEqual

    r = _batch_reader(pruned_table)
    list(r.pushFilters([EqualTo(("_commit_version",), 1)]))
    assert {p.version for p in r.partitions()} == {1}
    r2 = _batch_reader(pruned_table)
    list(r2.pushFilters([LessThanOrEqual(("_commit_version",), 0)]))
    assert {p.version for p in r2.partitions()} == {0}
    r3 = _batch_reader(pruned_table)
    list(r3.pushFilters([EqualTo(("_commit_version",), 7)]))
    assert r3.partitions() == []


def test_pushdown_end_to_end_exact(spark, pruned_table):
    register_delta_cdc(spark)
    ds = spark.read.format("pulsar_delta_cdc").option("tablePath", pruned_table).load()
    full = {(r.event_id, r._commit_version) for r in ds.collect()
            if r.event_type == "click" and r.event_id > 10}
    got = {
        (r.event_id, r._commit_version)
        for r in ds.where(
            (F.col("event_type") == "click") & (F.col("event_id") > 10)
        ).collect()
    }
    assert got == full and got  # identical results through the pruned plan


def test_batch_timestamp_bounds_ict(spark, tmp_path):
    """startingTimestamp/endingTimestamp (delta-spark CDF spellings,
    ISO-8601): starting → first commit AT OR AFTER T, ending → last
    commit at or before T; on an in-commit-timestamps table both
    resolve by the commit-carried clock, not file mtimes. Out-of-range
    bounds refuse loudly."""
    from datetime import datetime, timezone

    path = str(tmp_path / "tbl")
    t = DeltaTable(path)
    mk = lambda lo, hi: spark.range(lo, hi).select(  # noqa: E731
        F.col("id").alias("event_id"), (F.col("id") * 1.5).alias("value")
    )
    t.write(mk(0, 3), configuration={"delta.enableInCommitTimestamps": "true"})
    t.write(mk(3, 7))
    t.write(mk(7, 9))
    register_delta_cdc(spark)
    iso = lambda ms: datetime.fromtimestamp(  # noqa: E731
        ms / 1000, tz=timezone.utc
    ).isoformat()
    ict = {v: t.commit_timestamp_ms(v) for v in (0, 1, 2)}
    ds = (
        spark.read.format("pulsar_delta_cdc")
        .option("tablePath", path)
        .option("startingTimestamp", iso(ict[1]))
        .option("endingTimestamp", iso(ict[1]))
        .load()
    )
    got = {r._commit_version for r in ds.collect()}
    assert got == {1}
    # starting after the last commit refuses loudly
    with pytest.raises(Exception, match="no commits at or after"):
        (
            spark.read.format("pulsar_delta_cdc")
            .option("tablePath", path)
            .option("startingTimestamp", iso(ict[2] + 60_000))
            .load()
            .collect()
        )
    # exclusive spellings refuse loudly
    with pytest.raises(Exception, match="exclusive"):
        (
            spark.read.format("pulsar_delta_cdc")
            .option("tablePath", path)
            .option("startingVersion", 0)
            .option("startingTimestamp", iso(ict[0]))
            .load()
            .collect()
        )


def test_stream_rejects_ending_bounds(spark, cdc_table, tmp_path):
    """endingVersion/endingTimestamp are a BATCH CDF concept: a stream
    silently reading past the requested end (or eagerly erroring on a
    future endingTimestamp) is worse than refusing up front
    (delta-spark refuses them on streams too)."""
    for opt, val in (
        ("endingVersion", "1"),
        ("endingTimestamp", "2999-01-01T00:00:00"),
    ):
        reader = (
            spark.readStream.format("pulsar_delta_cdc")
            .option("tablePath", cdc_table)
            .option(opt, val)
        )
        with pytest.raises(Exception, match="not supported on.*streaming"):
            q = (
                reader.load()
                .writeStream.format("memory")
                .queryName(f"reject_{opt}")
                .option(
                    "checkpointLocation", str(tmp_path / f"ck_{opt}")
                )
                .trigger(availableNow=True)
                .start()
            )
            try:
                q.awaitTermination(60)
            finally:
                q.stop()
