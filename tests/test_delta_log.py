"""Delta-log layer tests (FIXTURES.md §4): snapshots, time travel with
the reference's fallback semantics, CDC op streams, writer atomicity,
idempotent txns, and protocol guards."""

import datetime
import json
import os
import time

import pytest
import pyspark.sql.functions as F

from pulsar_io_delta_spark.sources.delta_log import (
    DeltaProtocolError,
    DeltaTable,
    delta_sink,
)


@pytest.fixture()
def table_path(tmp_path):
    return str(tmp_path / "tbl")


def events_df(spark, ids, etype="click"):
    return spark.createDataFrame(
        [(i, etype, float(i)) for i in ids], "event_id long, event_type string, value double"
    )


def test_create_append_read(spark, table_path):
    t = DeltaTable(table_path)
    v0 = t.write(events_df(spark, range(10)))
    v1 = t.write(events_df(spark, range(10, 15)))
    assert (v0, v1) == (0, 1)
    assert t.read(spark).count() == 15
    assert t.read(spark, version=0).count() == 10


def test_version_fallback_to_latest(spark, table_path):
    """Missing version → latest (DeltaReader.java:148-164)."""
    t = DeltaTable(table_path)
    t.write(events_df(spark, range(5)))
    t.write(events_df(spark, range(5, 8)))
    assert t.resolve_version(version=99) == 1
    assert t.resolve_version(version=-1) == 1
    assert t.resolve_version(version=0) == 0


def test_timestamp_resolution(spark, table_path):
    t = DeltaTable(table_path)
    t.write(events_df(spark, range(3)))
    ts0 = t.commit_timestamp_ms(0)
    time.sleep(0.05)
    t.write(events_df(spark, range(3, 6)))
    assert t.resolve_version(timestamp_ms=ts0) == 0
    assert t.resolve_version(timestamp_ms=int(time.time() * 1000) + 10_000) == 1
    # before table creation → fallback to latest (DeltaReader.java:134-146)
    assert t.resolve_version(timestamp_ms=ts0 - 1_000_000) == 1


def test_overwrite_and_cdc_ops(spark, table_path):
    t = DeltaTable(table_path)
    t.write(events_df(spark, range(4)))
    t.write(events_df(spark, range(100, 102)), mode="overwrite")
    assert t.read(spark).count() == 2
    cdc = t.cdc(spark, start_version=0)
    by_op = {r["op"]: r["cnt"] for r in cdc.groupBy("op").agg(F.count("*").alias("cnt")).collect()}
    # v0 adds 4 rows (c), v1 removes those 4 (r) and adds 2 (c)
    assert by_op == {"c": 6, "r": 4}
    versions = {r._commit_version for r in cdc.select("_commit_version").distinct().collect()}
    assert versions == {0, 1}


def test_delete_where_emits_removes(spark, table_path):
    t = DeltaTable(table_path)
    t.write(events_df(spark, range(10)))
    t.delete_where(spark, "event_id >= 5")
    assert t.read(spark).count() == 5
    cdc = t.cdc(spark, start_version=1)
    ops = {r["op"] for r in cdc.select("op").distinct().collect()}
    assert "r" in ops


def test_partitioned_write_and_partition_value(spark, table_path):
    t = DeltaTable(table_path)
    df = events_df(spark, range(6)).withColumn(
        "event_type", F.when(F.col("event_id") % 2 == 0, "click").otherwise("buy")
    )
    t.write(df, partition_by=["event_type"])
    snap = t.snapshot()
    assert snap.partition_columns == ["event_type"]
    assert all(set(pv) == {"event_type"} for pv in snap.partition_values.values())
    back = t.read(spark)
    assert back.count() == 6
    assert set(back.columns) == {"event_id", "value", "event_type"}
    pvs = {r.partition_value for r in t.cdc(spark, 0).select("partition_value").collect()}
    assert pvs == {"event_type=click", "event_type=buy"}


def test_schema_changes_surface(spark, table_path):
    t = DeltaTable(table_path)
    t.write(events_df(spark, range(2)))
    changes = t.schema_changes(0)
    assert len(changes) == 1 and changes[0][0] == 0


def test_txn_idempotent(spark, table_path):
    t = DeltaTable(table_path)
    t.write(events_df(spark, range(3)), txn=("app", 0))
    again = t.write(events_df(spark, range(3)), txn=("app", 0))
    assert again == -1  # replayed batch is a no-op
    assert t.read(spark).count() == 3
    t.write(events_df(spark, range(3, 5)), txn=("app", 1))
    assert t.read(spark).count() == 5


def test_checkpoint_collapse_and_expiry(spark, table_path):
    """Checkpoint → O(1) snapshot: replay state collapses into parquet,
    expired JSON history stays readable via the checkpoint, and CDC
    over the expired range errors instead of silently skipping."""
    t = DeltaTable(table_path)
    t.write(events_df(spark, range(4)), txn=("app", 0))          # v0
    t.write(events_df(spark, range(4, 7)))                       # v1
    t.delete_where(spark, "event_id < 2")                        # v2
    cv = t.checkpoint()
    assert cv == 2
    before = {tuple(r) for r in t.read(spark).collect()}
    expired = t.expire_log()
    assert expired == [0, 1, 2]
    after = {tuple(r) for r in t.read(spark).collect()}
    assert after == before and len(after) == 5
    # idempotent-sink state survives expiry via checkpointed txn actions
    assert t.last_txn_version("app") == 0
    # new commits replay on top of the checkpoint
    t.write(events_df(spark, range(100, 102)))                   # v3
    assert t.read(spark).count() == 7
    assert t.latest_version() == 3
    # CDC from the expired range must fail loudly...
    with pytest.raises(DeltaProtocolError, match="expired"):
        t.cdc(spark, start_version=0)
    # ...but post-checkpoint CDC works
    assert t.cdc(spark, start_version=3).count() == 2


def test_compact_invisible_to_cdc(spark, table_path):
    t = DeltaTable(table_path)
    for i in range(5):
        t.write(events_df(spark, range(i * 10, (i + 1) * 10)).coalesce(1))
    assert len(t.snapshot().files) == 5
    rows_before = {tuple(r) for r in t.read(spark).collect()}
    t.compact(spark, target_files=1)
    assert len(t.snapshot().files) == 1
    assert {tuple(r) for r in t.read(spark).collect()} == rows_before
    # CDC sees only the 50 original inserts — compaction adds/removes are
    # dataChange=false and skipped
    cdc = t.cdc(spark, start_version=0)
    assert cdc.count() == 50
    assert {r.op for r in cdc.select("op").distinct().collect()} == {"c"}


def test_vacuum_removes_only_dead_files(spark, table_path):
    import glob

    t = DeltaTable(table_path)
    t.write(events_df(spark, range(10)))
    t.delete_where(spark, "event_id >= 5")
    n_parquet = lambda: len(  # noqa: E731
        [p for p in glob.glob(os.path.join(table_path, "**", "*.parquet"), recursive=True)
         if "_delta_log" not in p]
    )
    before = n_parquet()
    assert t.vacuum(retention_ms=10**12) == []  # inside retention: no-op
    deleted = t.vacuum(retention_ms=0)
    assert deleted and n_parquet() == before - len(deleted)
    assert t.read(spark).count() == 5  # live data intact


def test_foreign_checkpoint_layout_guard(spark, table_path):
    t = DeltaTable(table_path)
    t.write(events_df(spark, range(2)))
    # multi-part names are understood; an unrecognized layout still fails loudly
    ok = os.path.join(table_path, "_delta_log", "00000000000000000000.checkpoint.0000000001.0000000002.parquet")
    with open(ok, "wb") as f:
        f.write(b"")
    assert 0 in t.versions()
    os.remove(ok)
    weird = os.path.join(table_path, "_delta_log", "00000000000000000000.checkpoint.v2.parquet")
    with open(weird, "wb") as f:
        f.write(b"")
    with pytest.raises(DeltaProtocolError):
        t.versions()


def test_handwritten_log(spark, tmp_path):
    """Reader consumes logs written by any Delta writer — fabricate one
    by hand with the four action types the reference consumes."""
    root = str(tmp_path / "hand")
    os.makedirs(os.path.join(root, "_delta_log"))
    df = events_df(spark, range(7))
    df.coalesce(1).write.parquet(os.path.join(root, "data"))
    part = next(
        f for f in os.listdir(os.path.join(root, "data")) if f.endswith(".parquet")
    )
    rel = f"data/{part}"
    actions = [
        {"commitInfo": {"timestamp": 1700000000000, "operation": "WRITE"}},
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {"metaData": {"id": "x", "schemaString": df.schema.json(), "partitionColumns": []}},
        {"add": {"path": rel, "partitionValues": {}, "size": 1, "modificationTime": 1700000000000, "dataChange": True}},
    ]
    with open(os.path.join(root, "_delta_log", f"{0:020d}.json"), "w") as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")
    t = DeltaTable(root)
    assert t.read(spark).count() == 7
    assert t.commit_timestamp_ms(0) == 1700000000000


def test_streaming_delta_sink_exactly_once(spark, table_path):
    sink = delta_sink(table_path, app_id="stream-test")
    batch = events_df(spark, range(5))
    sink(batch, 0)
    sink(batch, 0)  # retried batch must not duplicate
    sink(events_df(spark, range(5, 9)), 1)
    assert DeltaTable(table_path).read(spark).count() == 9


def test_cdc_single_pass_many_commits(spark, tmp_path):
    """120-commit history: cdc() plans a handful of scans (one per
    (op, partition-epoch)), not one union branch per commit."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = str(tmp_path / "many")
    os.makedirs(path)
    t = DeltaTable(path)
    schema_json = (
        '{"type":"struct","fields":[{"name":"event_id","type":"long",'
        '"nullable":false,"metadata":{}}]}'
    )
    n_commits = 120
    for v in range(n_commits):
        rel = f"part-{v:05d}.parquet"
        pq.write_table(pa.table({"event_id": pa.array([v], pa.int64())}),
                       os.path.join(path, rel))
        t.commit_external_adds(
            [{"path": rel, "partitionValues": {}, "size": 1,
              "modificationTime": 1000 + v, "dataChange": True}],
            operation="WRITE", schema_json=schema_json,
        )
    df = t.cdc(spark, start_version=0)
    rows = df.collect()
    assert len(rows) == n_commits
    assert {r.event_id for r in rows} == set(range(n_commits))
    assert {r._commit_version for r in rows} == set(range(n_commits))
    # per-commit event time survives the grouped scan
    assert {r.ts for r in rows} == {
        datetime.datetime.fromtimestamp((1000 + v) / 1000, datetime.timezone.utc)
        .replace(tzinfo=None)
        for v in range(n_commits)
    }
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") <= 4  # flat: grouped, not per-commit


def test_multipart_checkpoint_roundtrip(spark, tmp_path):
    path = str(tmp_path / "mp")
    t = DeltaTable(path)
    for i in range(3):
        t.write(events_df(spark, range(i * 10, (i + 1) * 10)).coalesce(1))
    rows_before = {tuple(r) for r in t.read(spark).collect()}
    v = t.checkpoint(parts=2)
    names = sorted(os.listdir(os.path.join(path, "_delta_log")))
    assert f"{v:020d}.checkpoint.0000000001.0000000002.parquet" in names
    assert f"{v:020d}.checkpoint.0000000002.0000000002.parquet" in names
    assert t.checkpoint_versions() == [v]
    t.expire_log()  # snapshot must now come exclusively from the 2 parts
    assert {tuple(r) for r in t.read(spark).collect()} == rows_before
    t.write(events_df(spark, range(30, 35)).coalesce(1))
    assert t.read(spark).count() == 35


def test_incomplete_multipart_checkpoint_ignored(spark, tmp_path):
    path = str(tmp_path / "inc")
    t = DeltaTable(path)
    t.write(events_df(spark, range(10)).coalesce(1))
    v = t.checkpoint(parts=2)
    os.remove(
        os.path.join(path, "_delta_log", f"{v:020d}.checkpoint.0000000002.0000000002.parquet")
    )
    # half a checkpoint is no checkpoint: snapshot falls back to JSON replay
    assert t.checkpoint_versions() == []
    assert t.read(spark).count() == 10


def test_no_posix_calls_in_delta_table():
    """Control-plane discipline: DeltaTable touches storage only through
    the FileSystem shim (object-store portability)."""
    import inspect
    import re

    from pulsar_io_delta_spark.sources import delta_log

    src = inspect.getsource(delta_log.DeltaTable)
    banned = re.findall(
        r"os\.(?!path\.(?:join|relpath|dirname|basename|abspath|normpath|isabs)|sep)\w+"
        r"|(?<![\w.])open\(|shutil\.\w+",
        src,
    )
    assert banned == [], f"raw POSIX I/O in DeltaTable: {banned}"


def test_append_retries_past_commit_race(spark, table_path):
    """A blind append losing the exclusive-create race lands at the next
    version instead of failing."""
    t = DeltaTable(table_path)
    t.write(events_df(spark, range(3)))
    # simulate a racer: pre-claim the version the next commit will want
    racer = os.path.join(table_path, "_delta_log", f"{1:020d}.json")
    with open(racer, "x", encoding="utf-8") as f:
        f.write(json.dumps({"commitInfo": {"timestamp": 0, "operation": "WRITE"}}) + "\n")
    v = t.write(events_df(spark, range(3, 6)))
    assert v == 2
    assert t.read(spark).count() == 6


def test_overwrite_raises_on_lost_race(spark, table_path):
    from pulsar_io_delta_spark.sources.delta_log import DeltaConcurrentCommit

    t = DeltaTable(table_path)
    t.write(events_df(spark, range(3)))

    class RacingFS(type(t.fs)):
        def __init__(self, table):
            self._t = table
            self._raced = False

        def create_exclusive(self, path, data):
            if not self._raced and path.endswith(".json"):
                self._raced = True
                super().create_exclusive(path, '{"commitInfo": {"timestamp": 0, "operation": "WRITE"}}\n')
            super().create_exclusive(path, data)

    t2 = DeltaTable(table_path, fs=RacingFS(t))
    with pytest.raises(DeltaConcurrentCommit):
        t2.write(events_df(spark, range(10, 13)), mode="overwrite")
    # the loser published nothing: the racer's v1 commit stands alone
    assert DeltaTable(table_path).latest_version() == 1


def test_txn_append_no_double_delivery_under_race(spark, table_path):
    """If a racer already committed the same (appId, version) batch, the
    retry path returns -1 instead of appending a duplicate."""
    from pulsar_io_delta_spark.sources.fs import LocalFileSystem

    t = DeltaTable(table_path)
    t.write(events_df(spark, range(3)))

    class TxnRacerFS(LocalFileSystem):
        def __init__(self, table_path_):
            self._tp = table_path_
            self._raced = False

        def create_exclusive(self, path, data):
            if not self._raced and path.endswith(".json"):
                self._raced = True
                # racer delivers the SAME txn batch first
                DeltaTable(self._tp).write(
                    events_df(_spark_holder[0], range(3, 6)), txn=("app", 7)
                )
            super().create_exclusive(path, data)

    _spark_holder = [spark]
    t2 = DeltaTable(table_path, fs=TxnRacerFS(table_path))
    result = t2.write(events_df(spark, range(3, 6)), txn=("app", 7))
    assert result == -1  # recognized the racer's delivery, no duplicate
    assert DeltaTable(table_path).read(spark).count() == 6


def test_concurrent_appends_all_land(spark, tmp_path):
    """8 threads × 3 appends race on one table: optimistic retry makes
    every commit land exactly once (24 commits, 24 rows)."""
    import threading

    path = str(tmp_path / "conc")
    DeltaTable(path).write(events_df(spark, range(1)).coalesce(1))
    errors: list[Exception] = []

    def appender(tid: int) -> None:
        try:
            for j in range(3):
                base = 100 + tid * 10 + j
                DeltaTable(path).write(
                    events_df(spark, range(base, base + 1)).coalesce(1)
                )
        except Exception as e:  # pragma: no cover - failure reporting
            errors.append(e)

    threads = [threading.Thread(target=appender, args=(i,)) for i in range(8)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert errors == []
    t = DeltaTable(path)
    assert t.latest_version() == 24
    assert t.read(spark).count() == 25


def test_merge_upsert_updates_and_inserts(spark, table_path):
    t = DeltaTable(table_path)
    # two files so one can stay untouched
    t.write(events_df(spark, range(5)).coalesce(1))          # v0: ids 0-4
    t.write(events_df(spark, range(5, 10)).coalesce(1))      # v1: ids 5-9
    files_before = set(t.snapshot().files)
    src = spark.createDataFrame(
        [(7, "buy", 700.0), (9, "buy", 900.0), (42, "new", 4200.0)],
        "event_id long, event_type string, value double",
    )
    v = t.merge_upsert(spark, src, ["event_id"])
    assert v == 2
    rows = {r.event_id: (r.event_type, r.value) for r in t.read(spark).collect()}
    assert len(rows) == 11
    assert rows[7] == ("buy", 700.0) and rows[9] == ("buy", 900.0)
    assert rows[42] == ("new", 4200.0)
    assert rows[3] == ("click", 3.0)  # untouched
    # the ids 0-4 file contained no matched keys → never rewritten
    assert len(files_before & set(t.snapshot().files)) == 1
    # CDC: the merge commit removes 1 file's rows and adds the rewrite
    mc = t.cdc(spark, start_version=2)
    by_op = {r["op"]: r["cnt"] for r in mc.groupBy("op").agg(F.count("*").alias("cnt")).collect()}
    assert by_op == {"r": 5, "c": 6}  # 5 old rows out, 3 survivors + 3 upserts in


def test_merge_upsert_into_empty_and_unknown_column(spark, table_path):
    t = DeltaTable(table_path)
    t.write(events_df(spark, range(2)))
    bad = spark.createDataFrame([(1, 9.9)], "event_id long, bonus double")
    with pytest.raises(DeltaProtocolError, match="bonus"):
        t.merge_upsert(spark, bad, ["event_id"])
    # source missing a column → null-filled
    partial = spark.createDataFrame([(0,), (5,)], "event_id long")
    t.merge_upsert(spark, partial, ["event_id"])
    rows = {r.event_id: r.event_type for r in t.read(spark).collect()}
    assert rows == {0: None, 1: "click", 5: None}


# ---------- round-4 regressions: schema evolution via external adds, ----------
# ---------- epoch-correct CDC, percent-encoded paths ----------

_S1 = (
    '{"type":"struct","fields":[{"name":"event_id","type":"long",'
    '"nullable":true,"metadata":{}}]}'
)
_S2 = (
    '{"type":"struct","fields":[{"name":"event_id","type":"long",'
    '"nullable":true,"metadata":{}},{"name":"tag","type":"string",'
    '"nullable":true,"metadata":{}}]}'
)


def _ext_add(rel, mod_ms=1000):
    return {"path": rel, "partitionValues": {}, "size": 1,
            "modificationTime": mod_ms, "dataChange": True}


def _write_pq(path, rel, ids, tag=None):
    import pyarrow as pa
    import pyarrow.parquet as pq

    cols = {"event_id": pa.array(list(ids), pa.int64())}
    if tag is not None:
        cols["tag"] = pa.array([tag] * len(list(ids)), pa.string())
    pq.write_table(pa.table(cols), os.path.join(path, rel))


def test_external_adds_schema_evolution_recorded(spark, tmp_path):
    """A later commit_external_adds with an evolved schema_json must emit
    a metaData action; without it, read()/cdc() (pinned to the LOG
    schema) silently drop the new column (round-3 judge repro)."""
    path = str(tmp_path / "ext")
    os.makedirs(path)
    t = DeltaTable(path)
    _write_pq(path, "a.parquet", [1, 2])
    t.commit_external_adds([_ext_add("a.parquet")], "WRITE", schema_json=_S1)
    _write_pq(path, "b.parquet", [3], tag="x")
    t.commit_external_adds([_ext_add("b.parquet", 2000)], "WRITE", schema_json=_S2)
    # the evolution reached the log
    snap = t.snapshot()
    assert [f["name"] for f in json.loads(snap.schema_string)["fields"]] == ["event_id", "tag"]
    changes = t.schema_changes(1)
    assert [(v, json.loads(s)) for v, s in changes] == [(1, json.loads(_S2))]
    rows = {r.event_id: r.tag for r in t.read(spark).collect()}
    assert rows == {1: None, 2: None, 3: "x"}
    cdc = {r.event_id: (r.tag, r._commit_version) for r in t.cdc(spark).collect()}
    assert cdc == {1: (None, 0), 2: (None, 0), 3: ("x", 1)}
    # re-committing the same schema is NOT a new metadata epoch
    _write_pq(path, "c.parquet", [4], tag="y")
    v = t.commit_external_adds([_ext_add("c.parquet", 3000)], "WRITE", schema_json=_S2)
    assert not any("metaData" in a for a in t.actions(v))


def test_cdc_across_schema_boundary_one_call(spark, table_path):
    """One cdc() drain spanning an op='m' boundary: old-epoch rows
    null-fill the evolved column, commit versions stay per-epoch."""
    t = DeltaTable(table_path)
    t.write(events_df(spark, range(3)))
    t.write(events_df(spark, range(3, 5)).withColumn("tag", F.lit("new")))
    rows = {r.event_id: (r.tag, r._commit_version) for r in t.cdc(spark, 0).collect()}
    assert rows == {0: (None, 0), 1: (None, 0), 2: (None, 0),
                    3: ("new", 1), 4: ("new", 1)}


def test_cdc_readded_file_across_epochs(spark, tmp_path):
    """A path re-added after a schema evolution lives in two epoch
    buckets; the epoch-keyed lookup join must emit each commit's rows
    exactly once (2 copies, not 4)."""
    path = str(tmp_path / "re")
    os.makedirs(path)
    t = DeltaTable(path)
    _write_pq(path, "a.parquet", [1, 2])
    t.commit_external_adds([_ext_add("a.parquet")], "WRITE", schema_json=_S1)
    _write_pq(path, "b.parquet", [3], tag="x")
    t.commit_external_adds([_ext_add("b.parquet", 2000)], "WRITE", schema_json=_S2)
    t.commit_external_adds([_ext_add("a.parquet", 3000)], "WRITE", schema_json=_S2)
    rows = t.cdc(spark, 0).collect()
    assert len(rows) == 2 + 1 + 2
    by_commit = {}
    for r in rows:
        by_commit.setdefault(r._commit_version, []).append((r.event_id, r.tag))
    assert sorted(by_commit[0]) == [(1, None), (2, None)]
    assert sorted(by_commit[1]) == [(3, "x")]
    assert sorted(by_commit[2]) == [(1, None), (2, None)]


def test_special_char_table_path_cdc_and_merge(spark, tmp_path):
    """Table + partition paths with spaces/%/+ survive the
    _metadata.file_path percent-encoding round trip in cdc() AND
    merge_upsert() (ADVICE round-3: merge stripped the scheme but never
    url-decoded, so touched-file relpaths missed)."""
    path = str(tmp_path / "sp ace %25 +plus" / "tbl")
    t = DeltaTable(path)
    df = spark.createDataFrame(
        [(1, "europe west"), (2, "asia+east")], "id long, region string"
    )
    t.write(df, partition_by=["region"])
    got = {(r.id, r.region) for r in t.cdc(spark).collect()}
    assert got == {(1, "europe west"), (2, "asia+east")}
    src = spark.createDataFrame(
        [(1, "europe north"), (3, "no where")], "id long, region string"
    )
    t.merge_upsert(spark, src, ["id"])
    final = {(r.id, r.region) for r in t.read(spark).collect()}
    assert final == {(1, "europe north"), (2, "asia+east"), (3, "no where")}


# ---------- OCC commit protocol over both FileSystem backends ----------
# The data plane (Spark parquet) stays on local disk; these scenarios
# drive the pure-control-plane path (commit_external_adds / _commit /
# snapshot) so the in-memory object-store model exercises the same
# conditional-create CAS the local O_EXCL backend does.

from pulsar_io_delta_spark.sources.fs import InMemoryFileSystem, LocalFileSystem


class _HookedLocalFS(LocalFileSystem):
    """LocalFileSystem with the same injectable create_exclusive hook
    InMemoryFileSystem exposes, so race tests parameterize cleanly."""

    def __init__(self):
        self.on_create_exclusive = None

    def create_exclusive(self, path, data):
        if self.on_create_exclusive is not None:
            self.on_create_exclusive(path, data)
        super().create_exclusive(path, data)


@pytest.fixture(params=["local", "mem"])
def occ_fs(request, tmp_path):
    if request.param == "local":
        return _HookedLocalFS(), str(tmp_path / "occ")
    return InMemoryFileSystem(), "/mem/occ"


def test_fs_conformance(occ_fs):
    fs, root = occ_fs
    fs.makedirs(root + "/sub")
    assert fs.isdir(root) and fs.isdir(root + "/sub")
    fs.write_text(root + "/sub/a.txt", "alpha")
    assert fs.read_text(root + "/sub/a.txt") == "alpha"
    assert fs.exists(root + "/sub/a.txt") and not fs.exists(root + "/nope")
    fs.create_exclusive(root + "/sub/b.txt", "beta")
    with pytest.raises(FileExistsError):
        fs.create_exclusive(root + "/sub/b.txt", "again")
    assert sorted(fs.listdir(root + "/sub")) == ["a.txt", "b.txt"]
    with fs.open_write(root + "/sub/c.bin") as f:
        f.write(b"\x00\x01")
    with fs.open_read(root + "/sub/c.bin") as f:
        assert f.read() == b"\x00\x01"
    assert fs.size(root + "/sub/c.bin") == 2
    assert fs.mtime_ms(root + "/sub/c.bin") > 0
    fs.move(root + "/sub/c.bin", root + "/c2.bin")
    assert fs.exists(root + "/c2.bin") and not fs.exists(root + "/sub/c.bin")
    walked = {p.replace(root + "/", "") for p in fs.walk_files(root)}
    assert walked == {"sub/a.txt", "sub/b.txt", "c2.bin"}
    fs.remove(root + "/c2.bin")
    fs.rmtree(root + "/sub")
    assert not fs.exists(root + "/sub/a.txt") and not fs.isdir(root + "/sub")


def test_create_exclusive_publishes_atomically(tmp_path):
    """A commit file must never be visible with partial content: the
    pre-r16 LocalFileSystem opened the final name with 'x' and THEN
    wrote the body, so a snapshot replay racing a committer could read
    an empty commit and silently drop its actions (observed once as a
    .crc/replay mismatch in the OCC race test under heavy rig load).
    The fix publishes via write-temp + os.link. This test pins both
    properties: every .json a concurrent reader can see is complete,
    and the losing side still gets FileExistsError with no .tmp debris."""
    import threading

    fs = LocalFileSystem()
    d = str(tmp_path / "atomic")
    fs.makedirs(d)
    body = "x" * (1 << 20)  # 1 MiB: wide write window under the old code
    bad: list[str] = []
    stop = threading.Event()

    def reader() -> None:
        while not stop.is_set():
            for name in os.listdir(d):
                if not name.endswith(".json"):
                    continue
                try:
                    txt = fs.read_text(os.path.join(d, name))
                except FileNotFoundError:
                    continue
                if len(txt) != len(body):  # pragma: no cover - failure path
                    bad.append(f"{name}: {len(txt)} bytes")

    th = threading.Thread(target=reader)
    th.start()
    try:
        for i in range(50):
            fs.create_exclusive(os.path.join(d, f"{i:020d}.json"), body)
    finally:
        stop.set()
        th.join()
    assert bad == []
    with pytest.raises(FileExistsError):
        fs.create_exclusive(os.path.join(d, f"{0:020d}.json"), "loser")
    assert fs.read_text(os.path.join(d, f"{0:020d}.json")) == body
    assert [n for n in os.listdir(d) if n.endswith(".tmp")] == []


def test_occ_concurrent_external_adds_all_land(occ_fs):
    """8 threads × 3 external-adds commits race on one log: optimistic
    retry lands every commit exactly once on BOTH backends."""
    import threading

    fs, root = occ_fs
    DeltaTable(root, fs=fs).commit_external_adds(
        [_ext_add("seed.parquet")], "WRITE", schema_json=_S1
    )
    errors: list[Exception] = []

    def worker(tid: int) -> None:
        try:
            for j in range(3):
                DeltaTable(root, fs=fs).commit_external_adds(
                    [_ext_add(f"f-{tid}-{j}.parquet")], "WRITE", schema_json=_S1
                )
        except Exception as e:  # pragma: no cover - failure reporting
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert errors == []
    t = DeltaTable(root, fs=fs)
    assert t.latest_version() == 24
    assert len(t.snapshot().files) == 25  # every add exactly once


def test_occ_txn_idempotent_under_injected_race(occ_fs):
    """A racer delivering the same (appId, version) batch inside the
    conditional-create window makes the loser return -1, not duplicate."""
    fs, root = occ_fs
    t = DeltaTable(root, fs=fs)
    t.commit_external_adds([_ext_add("seed.parquet")], "WRITE", schema_json=_S1)
    fired = []

    def racer(path, data):
        if path.endswith(".json") and not fired:
            fired.append(1)
            DeltaTable(root, fs=fs).commit_external_adds(
                [_ext_add("racer.parquet")], "WRITE", schema_json=_S1, txn=("app", 7)
            )

    fs.on_create_exclusive = racer
    result = t.commit_external_adds(
        [_ext_add("mine.parquet")], "WRITE", schema_json=_S1, txn=("app", 7)
    )
    fs.on_create_exclusive = None
    assert result == -1
    files = set(DeltaTable(root, fs=fs).snapshot().files)
    assert files == {"seed.parquet", "racer.parquet"}  # no double delivery


def test_occ_schema_evolution_rebuilds_actions_on_race(occ_fs):
    """Losing the race with a pending schema evolution must re-merge
    against the racer's commit, not clobber or drop the metaData."""
    fs, root = occ_fs
    t = DeltaTable(root, fs=fs)
    t.commit_external_adds([_ext_add("a.parquet")], "WRITE", schema_json=_S1)
    fired = []

    def racer(path, data):
        if path.endswith(".json") and not fired:
            fired.append(1)
            DeltaTable(root, fs=fs).commit_external_adds(
                [_ext_add("r.parquet")], "WRITE", schema_json=_S1
            )

    fs.on_create_exclusive = racer
    v = t.commit_external_adds([_ext_add("b.parquet")], "WRITE", schema_json=_S2)
    fs.on_create_exclusive = None
    assert v == 2
    t2 = DeltaTable(root, fs=fs)
    snap = t2.snapshot()
    assert set(snap.files) == {"a.parquet", "r.parquet", "b.parquet"}
    assert [f["name"] for f in json.loads(snap.schema_string)["fields"]] == ["event_id", "tag"]
    assert any("metaData" in a for a in t2.actions(2))


def test_occ_checkpoint_and_expiry_roundtrip(occ_fs):
    """Checkpoint parquet + log expiry through the FileSystem interface
    (pyarrow over open_write/open_read BytesIO on the in-memory
    backend): collapsed state must replay identically on both."""
    fs, root = occ_fs
    t = DeltaTable(root, fs=fs)
    for v in range(4):
        t.commit_external_adds(
            [_ext_add(f"f-{v}.parquet", 1000 + v)], "WRITE", schema_json=_S1,
            txn=("app", v),
        )
    cv = t.checkpoint()
    assert cv == 3
    before = set(t.snapshot().files)
    expired = t.expire_log()
    assert expired == [0, 1, 2, 3]
    t2 = DeltaTable(root, fs=fs)
    snap = t2.snapshot()
    assert set(snap.files) == before == {f"f-{v}.parquet" for v in range(4)}
    assert [f["name"] for f in json.loads(snap.schema_string)["fields"]] == ["event_id"]
    # txn state survives expiry via the checkpoint
    assert t2.last_txn_version("app") == 3
    # new commits replay on top of the checkpoint
    t2.commit_external_adds([_ext_add("f-9.parquet", 2000)], "WRITE", schema_json=_S1)
    assert t2.latest_version() == 4
    assert len(t2.snapshot().files) == 5


def test_external_adds_partition_by_none_keeps_partitioning(spark, tmp_path):
    """partition_by=None on a later external-adds commit must keep the
    table's partition columns, not silently reset them to []."""
    path = str(tmp_path / "pext")
    t = DeltaTable(path)
    df = spark.createDataFrame([(1, "a"), (2, "b")], "event_id long, part string")
    t.write(df, partition_by=["part"])
    schema = t.snapshot().schema_string
    _write_pq(path, "extra.parquet", [3])
    # note: unpartitioned file into a partitioned table is the caller's
    # responsibility; here we only assert the metadata semantics
    t.commit_external_adds([_ext_add("extra.parquet")], "WRITE", schema_json=schema)
    assert t.snapshot().partition_columns == ["part"]
    # explicit [] IS a deliberate reset and records a metaData action
    v = t.commit_external_adds(
        [_ext_add("extra2.parquet")], "WRITE", schema_json=schema, partition_by=[]
    )
    _write_pq(path, "extra2.parquet", [4])
    assert t.snapshot().partition_columns == []
    assert any("metaData" in a for a in t.actions(v))


def test_occ_concurrent_create_race_merges_not_clobbers(occ_fs):
    """Two concurrent table creators: the loser must re-enter as a
    non-first commit (schema merge against the racer's metaData), never
    blind-append a second protocol/metaData clobbering the winner."""
    fs, root = occ_fs
    t = DeltaTable(root, fs=fs)
    fired = []

    def racer(path, data):
        if path.endswith(".json") and not fired:
            fired.append(1)
            DeltaTable(root, fs=fs).commit_external_adds(
                [_ext_add("winner.parquet")], "WRITE", schema_json=_S2
            )

    fs.on_create_exclusive = racer
    v = t.commit_external_adds([_ext_add("loser.parquet")], "WRITE", schema_json=_S1)
    fs.on_create_exclusive = None
    assert v == 1
    t2 = DeltaTable(root, fs=fs)
    snap = t2.snapshot()
    assert set(snap.files) == {"winner.parquet", "loser.parquet"}
    # winner's evolved schema survives (S1's fields are a subset)
    assert [f["name"] for f in json.loads(snap.schema_string)["fields"]] == ["event_id", "tag"]
    # exactly one protocol + one metaData in the whole log
    all_actions = [a for ver in t2.versions() for a in t2.actions(ver)]
    assert sum(1 for a in all_actions if "protocol" in a) == 1
    assert sum(1 for a in all_actions if "metaData" in a) == 1


def test_handwritten_log_unsupported_protocol_fails_loudly(spark, tmp_path):
    """Protocol gating (reference parity: the reference consumes only
    add/remove/metaData/commitInfo — DeltaReader.java:196-247 — and
    anything newer must fail LOUDLY, never silently mis-read): a log
    demanding a reader feature outside _SUPPORTED_READER_FEATURES
    (an unknown future feature) raises
    DeltaProtocolError at snapshot resolution. deletionVectors /
    columnMapping / timestampNtz (round 7) and v2Checkpoint (round 8)
    are implemented and must NOT trip the gate — the positive half
    asserts a v3 DV-feature table reads clean."""
    root = str(tmp_path / "hand_v3")
    os.makedirs(os.path.join(root, "_delta_log"))
    df = events_df(spark, range(3))
    df.coalesce(1).write.parquet(os.path.join(root, "data"))
    part = next(
        f for f in os.listdir(os.path.join(root, "data")) if f.endswith(".parquet")
    )
    actions = [
        {"commitInfo": {"timestamp": 1700000000000, "operation": "WRITE"}},
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["deletionVectors", "someFutureFeature"]}},
        {"metaData": {"id": "x", "schemaString": df.schema.json(), "partitionColumns": []}},
        {"add": {"path": f"data/{part}", "partitionValues": {}, "size": 1,
                 "modificationTime": 1700000000000, "dataChange": True}},
    ]
    log_fp = os.path.join(root, "_delta_log", f"{0:020d}.json")
    with open(log_fp, "w") as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")
    with pytest.raises(DeltaProtocolError, match="someFutureFeature"):
        DeltaTable(root).read(spark).count()
    # Positive half: the SAME table minus the unsupported feature is a
    # legal v3 deletion-vectors table and must read (no DV on the add →
    # all rows visible).
    actions[1]["protocol"]["readerFeatures"] = ["deletionVectors"]
    with open(log_fp, "w") as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")
    assert DeltaTable(root).read(spark).count() == 3


def test_in_commit_timestamps_monotonic_and_authoritative(spark, tmp_path):
    """delta.enableInCommitTimestamps (Delta PROTOCOL.md "In-Commit
    Timestamps"): every commit carries a STRICTLY increasing
    commitInfo.inCommitTimestamp, and timestamp time-travel trusts it
    over wall timestamps — the defense against clock-skewed object
    stores reordering history."""
    t = DeltaTable(str(tmp_path / "ict"))
    t.write(
        events_df(spark, range(3)),
        configuration={"delta.enableInCommitTimestamps": "true"},
    )
    t.write(events_df(spark, range(3, 6)))
    t.delete_where(spark, "event_id = 0")
    icts = []
    for v in t.json_versions():
        (info,) = [a["commitInfo"] for a in t.actions(v) if "commitInfo" in a]
        icts.append(int(info["inCommitTimestamp"]))
        assert t.commit_timestamp_ms(v) == icts[-1]
    assert icts == sorted(set(icts)), icts  # strictly increasing
    # time travel at exactly v1's ICT resolves to v1
    assert t.read(spark, timestamp_ms=icts[1]).count() == 6
    assert t.read(spark, timestamp_ms=icts[0]).count() == 3


def test_check_constraints_writer_feature_table_enforced(spark, tmp_path):
    """A table-features protocol advertising checkConstraints is
    WRITABLE (round 8: the gate used to refuse it) because every write
    path enforces delta.constraints.* — a violating commit still
    refuses loudly."""
    t = DeltaTable(str(tmp_path / "cc"))
    t.write(
        events_df(spark, range(5)),
        configuration={"delta.constraints.positive": "value >= 0"},
    )
    snap = t.snapshot()
    t._commit(
        [{"protocol": {"minReaderVersion": 1, "minWriterVersion": 7,
                       "writerFeatures": ["appendOnly", "invariants",
                                          "checkConstraints"]}}],
        operation="UPGRADE",
        read_version=snap.version,
    )
    t.write(events_df(spark, range(5, 8)))  # valid rows pass
    assert t.read(spark).count() == 8
    from pulsar_io_delta_spark.sources.delta_log import DeltaConstraintViolation

    bad = spark.createDataFrame(
        [(99, "click", -1.0)], "event_id long, event_type string, value double"
    )
    with pytest.raises(DeltaConstraintViolation):
        t.write(bad)


def _arm_generated(t, spark):
    """Publish a metaData commit adding a generated column
    etype_upper = upper(event_type) (Delta 'Generated Columns')."""
    snap = t.snapshot()
    s = json.loads(snap.schema_string)
    s["fields"].append(
        {"name": "etype_upper", "type": "string", "nullable": True,
         "metadata": {"delta.generationExpression": "upper(event_type)"}}
    )
    md = {"metaData": {"id": "gen", "schemaString": json.dumps(s),
                       "partitionColumns": [],
                       "format": {"provider": "parquet", "options": {}},
                       "configuration": dict(snap.configuration or {})}}
    proto = {"protocol": {"minReaderVersion": 1, "minWriterVersion": 7,
                          "writerFeatures": ["appendOnly", "invariants",
                                             "generatedColumns"]}}
    t._commit([proto, md], operation="UPGRADE", read_version=snap.version)


def test_generated_columns_computed_validated_recomputed(spark, tmp_path):
    from pulsar_io_delta_spark.sources.delta_log import (
        DeltaConstraintViolation,
        DeltaProtocolError,
    )

    t = DeltaTable(str(tmp_path / "gen"))
    t.write(events_df(spark, range(3)))
    _arm_generated(t, spark)
    # append WITHOUT the generated column → computed on write
    t.write(events_df(spark, range(3, 5), etype="buy"))
    got = {r.event_id: r.etype_upper for r in t.read(spark).collect()}
    assert got[3] == "BUY" and got[4] == "BUY"
    assert got[0] is None  # pre-upgrade file: null-filled, never backfilled
    # append WITH a wrong provided value → loud
    bad = spark.createDataFrame(
        [(9, "click", 9.0, "WRONG")],
        "event_id long, event_type string, value double, etype_upper string",
    )
    with pytest.raises(DeltaConstraintViolation, match="generated column"):
        t.write(bad)
    # merge source omitting the column → computed
    src = spark.createDataFrame(
        [(3, "sell", 30.0)], "event_id long, event_type string, value double"
    )
    t.merge_upsert(spark, src, key_cols=["event_id"])
    got = {r.event_id: (r.event_type, r.etype_upper) for r in t.read(spark).collect()}
    assert got[3] == ("sell", "SELL")
    # UPDATE refuses direct assignment of a generated column...
    with pytest.raises(DeltaProtocolError, match="generated columns"):
        t.update_where(spark, "event_id = 4", {"etype_upper": "'X'"})
    # ...and recomputes it when a referenced base column changes
    t.update_where(spark, "event_id = 4", {"event_type": "'promo'"})
    got = {r.event_id: (r.event_type, r.etype_upper) for r in t.read(spark).collect()}
    assert got[4] == ("promo", "PROMO")


def _arm_identity(t, allow=False, start=100, step=10):
    snap = t.snapshot()
    s = json.loads(snap.schema_string)
    s["fields"].append(
        {"name": "row_sk", "type": "long", "nullable": True,
         "metadata": {"delta.identity.start": start,
                      "delta.identity.step": step,
                      "delta.identity.allowExplicitInsert": allow}}
    )
    md = {"metaData": {"id": "ident", "schemaString": json.dumps(s),
                       "partitionColumns": [],
                       "format": {"provider": "parquet", "options": {}},
                       "configuration": dict(snap.configuration or {})}}
    proto = {"protocol": {"minReaderVersion": 1, "minWriterVersion": 7,
                          "writerFeatures": ["appendOnly", "invariants",
                                             "identityColumns"]}}
    t._commit([proto, md], operation="UPGRADE", read_version=snap.version)


def test_identity_columns_assign_unique_lattice_values(spark, tmp_path):
    """Identity columns (Delta 'Identity Columns'): appends omitting the
    column get UNIQUE values on the start + k*step lattice; the
    highWaterMark advances from staged footer stats so the next write
    never collides; GENERATED ALWAYS refuses explicit values."""
    from pulsar_io_delta_spark.sources.delta_log import DeltaProtocolError

    t = DeltaTable(str(tmp_path / "ident"))
    t.write(events_df(spark, range(0)))  # schema-only
    _arm_identity(t)
    t.write(events_df(spark, range(7)))
    vals1 = [r.row_sk for r in t.read(spark).select("row_sk").collect()]
    assert len(vals1) == len(set(vals1)) == 7
    assert all(v is not None and (v - 100) % 10 == 0 for v in vals1)
    # watermark recorded; second write strictly beyond it
    snap = t.snapshot()
    hw = next(
        int(f["metadata"]["delta.identity.highWaterMark"])
        for f in json.loads(snap.schema_string)["fields"] if f["name"] == "row_sk"
    )
    assert hw == max(vals1)
    t.write(events_df(spark, range(7, 12)))
    vals2 = [r.row_sk for r in t.read(spark).select("row_sk").collect()]
    assert len(vals2) == len(set(vals2)) == 12
    assert min(set(vals2) - set(vals1)) > hw
    # GENERATED ALWAYS: explicit values refuse
    explicit = spark.createDataFrame(
        [(99, "click", 9.9, 123)],
        "event_id long, event_type string, value double, row_sk long",
    )
    with pytest.raises(DeltaProtocolError, match="GENERATED ALWAYS"):
        t.write(explicit)
    # UPDATE cannot assign it; MERGE without allowExplicitInsert refuses
    with pytest.raises(DeltaProtocolError, match="identity columns"):
        t.update_where(spark, "event_id = 1", {"row_sk": "1"})
    with pytest.raises(DeltaProtocolError, match="identity columns"):
        t.merge_upsert(spark, explicit, key_cols=["event_id"])


def test_identity_allow_explicit_insert_syncs_watermark(spark, tmp_path):
    """GENERATED BY DEFAULT (allowExplicitInsert): provided values are
    accepted and the watermark still advances past them."""
    t = DeltaTable(str(tmp_path / "ident2"))
    t.write(events_df(spark, range(0)))
    _arm_identity(t, allow=True)
    explicit = spark.createDataFrame(
        [(0, "click", 0.0, 5000), (1, "click", 1.0, 7000)],
        "event_id long, event_type string, value double, row_sk long",
    )
    t.write(explicit)
    snap = t.snapshot()
    hw = next(
        int(f["metadata"]["delta.identity.highWaterMark"])
        for f in json.loads(snap.schema_string)["fields"] if f["name"] == "row_sk"
    )
    assert hw == 7000
    t.write(events_df(spark, range(2, 5)))  # generated: must clear 7000
    vals = {r.event_id: r.row_sk for r in t.read(spark).collect()}
    assert all(vals[i] > 7000 for i in (2, 3, 4))


def test_variant_column_roundtrip_and_protocol(spark, tmp_path):
    """VARIANT columns (round 8): write() auto-upgrades the protocol to
    the variantType table feature at creation, the value round-trips
    through our reader (Spark decodes the physical
    struct<metadata,value> natively), DML over variant rows works, and
    schema EVOLUTION adding a variant column upgrades a legacy
    protocol."""
    t = DeltaTable(str(tmp_path / "var"))
    df = spark.sql(
        "SELECT id AS event_id, parse_json(concat('{\"k\":', id, '}')) AS payload "
        "FROM range(6)"
    )
    t.write(df)
    p = t.snapshot().protocol
    assert "variantType" in p["readerFeatures"]
    assert "variantType" in p["writerFeatures"]
    out = t.read(spark).selectExpr(
        "event_id", "variant_get(payload, '$.k', 'long') AS k"
    )
    assert {(r.event_id, r.k) for r in out.collect()} == {(i, i) for i in range(6)}
    # DML over a variant predicate column
    t.delete_where(spark, "variant_get(payload, '$.k', 'long') >= 4")
    assert t.read(spark).count() == 4
    # evolution: adding a variant column to a LEGACY table upgrades it
    t2 = DeltaTable(str(tmp_path / "var2"))
    t2.write(events_df(spark, range(3)))
    assert "readerFeatures" not in t2.snapshot().protocol
    widened = spark.sql(
        "SELECT id + 10 AS event_id, 'click' AS event_type, "
        "CAST(id AS DOUBLE) AS value, parse_json('{\"x\":1}') AS extra "
        "FROM range(2)"
    )
    t2.write(widened)
    assert "variantType" in t2.snapshot().protocol["readerFeatures"]
    got = t2.read(spark).selectExpr(
        "event_id", "variant_get(extra, '$.x', 'long') AS x"
    ).collect()
    assert {(r.event_id, r.x) for r in got} == {
        (0, None), (1, None), (2, None), (10, 1), (11, 1)
    }


def test_type_widening_reads_narrow_files_as_wide(spark, tmp_path):
    """typeWidening (Delta 'Type Widening'): files written BEFORE the
    widening keep their narrow physical type; the reader pins the
    widened log schema and Spark upconverts — int→long here — while
    post-widening appends land wide. Appends to the widened table pass
    the writer gate (we never change types ourselves)."""
    from pyspark.sql.types import IntegerType, StructField, StructType

    t = DeltaTable(str(tmp_path / "tw"))
    narrow = spark.createDataFrame(
        [(i,) for i in range(4)], StructType([StructField("a", IntegerType())])
    )
    t.write(narrow.coalesce(1))
    snap = t.snapshot()
    s = json.loads(snap.schema_string)
    assert s["fields"][0]["type"] == "integer"
    s["fields"][0]["type"] = "long"
    s["fields"][0]["metadata"] = {
        "delta.typeChanges": [{"fromType": "integer", "toType": "long"}]
    }
    t._commit(
        [
            {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                          "readerFeatures": ["typeWidening"],
                          "writerFeatures": ["appendOnly", "invariants",
                                             "typeWidening"]}},
            {"metaData": {"id": "tw", "schemaString": json.dumps(s),
                          "partitionColumns": [],
                          "format": {"provider": "parquet", "options": {}},
                          "configuration": {}}},
        ],
        operation="ALTER COLUMN",
        read_version=snap.version,
    )
    t.write(spark.createDataFrame([(10_000_000_000,)], "a long").coalesce(1))
    out = t.read(spark)
    assert dict(out.dtypes)["a"] == "bigint"
    assert {r.a for r in out.collect()} == {0, 1, 2, 3, 10_000_000_000}
    # DML across the mixed narrow/wide file population
    t.delete_where(spark, "a = 2")
    assert {r.a for r in t.read(spark).collect()} == {0, 1, 3, 10_000_000_000}


# ---------------------------------------------------------------------------
# Version checksums (<version>.crc, round 9 — delta-spark's integrity sidecar)


def test_version_checksum_written_and_valid(spark, table_path):
    """Every committer-produced version carries a .crc whose file count
    and byte total match the replayed state (snapshot() validates on
    load — this test also proves the gate passes on honest logs),
    including through delete/overwrite churn."""
    t = DeltaTable(table_path)
    t.write(events_df(spark, range(20)).repartition(2))
    t.write(events_df(spark, range(20, 30)))
    t.delete_where(spark, "event_id % 2 = 0")
    for v in t.json_versions():
        crc = t._read_checksum(v)
        assert crc is not None, v
        snap = t.snapshot(v)
        nf, tb = snap.adds.file_stats_totals()
        assert crc["numFiles"] == nf == len(snap.files), v
        assert crc["tableSizeBytes"] == tb, v
        assert crc["numMetadata"] == 1 and crc["numProtocol"] == 1


def test_version_checksum_mismatch_is_loud(spark, table_path):
    """Tampering with the log after the .crc was written (dropping an
    add — the silent-data-loss corruption class) fails the next replay
    loudly instead of returning wrong rows."""
    t = DeltaTable(table_path)
    t.write(events_df(spark, range(10)).repartition(2))
    fp = os.path.join(t.log_dir, f"{0:020d}.json")
    lines = open(fp).read().splitlines()
    adds = [ln for ln in lines if '"add"' in ln]
    assert len(adds) == 2
    # drop ONE add action from the commit body, keep the .crc
    kept = [ln for ln in lines if ln != adds[0]]
    open(fp, "w").write("\n".join(kept) + "\n")
    t2 = DeltaTable(table_path)  # fresh handle: no validation cache
    with pytest.raises(DeltaProtocolError, match="checksum mismatch"):
        t2.snapshot()


def test_version_checksum_absent_skips_validation(spark, table_path):
    """Handwritten/foreign logs without .crc sidecars read normally —
    validation is opt-in by the committer."""
    t = DeltaTable(table_path)
    t.write(events_df(spark, range(10)))
    for n in t.fs.listdir(t.log_dir):
        if n.endswith(".crc"):
            t.fs.remove(os.path.join(t.log_dir, n))
    t2 = DeltaTable(table_path)
    assert t2.read(spark).count() == 10


def test_version_checksum_validates_from_checkpoint_base(spark, table_path):
    """The compact checkpoint dialect persists add.size, so .crc
    validation keeps working after log expiry (replay from the
    checkpoint base + tail)."""
    t = DeltaTable(table_path)
    t.write(events_df(spark, range(10)).repartition(2))
    t.write(events_df(spark, range(10, 15)))
    t.checkpoint()
    t.expire_log()
    t.write(events_df(spark, range(15, 18)))
    t2 = DeltaTable(table_path)
    snap = t2.snapshot()  # validates against the latest .crc
    nf, tb = snap.adds.file_stats_totals()
    crc = t2._read_checksum(snap.version)
    assert (nf, tb) == (crc["numFiles"], crc["tableSizeBytes"])
    assert t2.read(spark).count() == 18


# ---------------------------------------------------------------------------
# Default column values (allowColumnDefaults, round 9)


def test_column_defaults_applied_on_write(spark, table_path):
    """SET DEFAULT is a metadata-only commit; a later append that OMITS
    the column gets the evaluated expression, while rows written before
    the default (and frames that DO carry the column) are untouched —
    Delta's write-time-only semantics."""
    t = DeltaTable(table_path)
    full = spark.createDataFrame(
        [(0, "web"), (1, "api")], "event_id long, src string"
    )
    t.write(full)
    t.set_column_default("src", "'backfill'")
    feats = set(t.snapshot().protocol.get("writerFeatures") or ())
    assert "allowColumnDefaults" in feats
    # omitted column -> default; expression defaults work too
    t.write(spark.createDataFrame([(2,), (3,)], "event_id long"))
    t.set_column_default("src", "concat('gen-', '9')")
    t.write(spark.createDataFrame([(4,)], "event_id long"))
    # explicit values always win
    t.write(spark.createDataFrame([(5, "explicit")], "event_id long, src string"))
    got = {r.event_id: r.src for r in t.read(spark).collect()}
    assert got == {0: "web", 1: "api", 2: "backfill", 3: "backfill",
                   4: "gen-9", 5: "explicit"}
    # DROP DEFAULT: an omitting write reverts to null columns
    t.drop_column_default("src")
    t.write(spark.createDataFrame([(6,)], "event_id long"))
    got = {r.event_id: r.src for r in t.read(spark).collect()}
    assert got[6] is None


def test_column_default_guards(spark, table_path):
    t = DeltaTable(table_path)
    t.write(events_df(spark, range(3)))
    with pytest.raises(DeltaProtocolError, match="no such column"):
        t.set_column_default("nope", "'x'")
    # typed default: cast to the field type at write time
    t.set_column_default("value", "3.5")
    t.write(spark.createDataFrame(
        [(100, "click")], "event_id long, event_type string"
    ))
    row = {r.event_id: r.value for r in t.read(spark).collect()}
    assert row[100] == 3.5


def test_optimize_where_partition_scoped(spark, table_path):
    """OPTIMIZE ... WHERE rewrites ONLY the matching partition's files;
    other partitions' files are untouched (O(selected), not O(table)),
    and non-partition predicates refuse loudly."""
    t = DeltaTable(table_path)
    df = events_df(spark, range(12)).withColumn(
        "event_type", F.when(F.col("event_id") % 2 == 0, "click").otherwise("buy")
    )
    # 3 small files per partition
    for k in range(3):
        t.write(
            df.where(F.col("event_id") % 3 == k).repartition(1),
            partition_by=["event_type"] if k == 0 else None,
        )
    snap = t.snapshot()
    buy_before = {p for p in snap.files if "event_type=buy" in p}
    click_before = {p for p in snap.files if "event_type=click" in p}
    assert len(buy_before) == 3 and len(click_before) == 3
    rows_before = {tuple(r) for r in t.read(spark).collect()}

    t.compact(spark, target_files=1, filters=[("event_type", "=", "click")])
    snap = t.snapshot()
    assert {p for p in snap.files if "event_type=buy" in p} == buy_before
    assert len([p for p in snap.files if "event_type=click" in p]) == 1
    assert {tuple(r) for r in t.read(spark).collect()} == rows_before

    with pytest.raises(DeltaProtocolError, match="partition predicates only"):
        t.compact(spark, filters=[("event_id", ">=", 5)])
    # empty selection is a no-op commit
    v = t.latest_version()
    assert t.compact(spark, filters=[("event_type", "=", "nope")]) == v


def test_checkpoint_interval_auto_checkpoints(spark, table_path):
    """delta.checkpointInterval: every Nth commit leaves a checkpoint
    without any manual call — replay stays O(tail) on long logs."""
    t = DeltaTable(table_path)
    t.write(
        events_df(spark, range(4)),
        configuration={"delta.checkpointInterval": "2"},
    )
    for i in range(1, 5):
        t.write(events_df(spark, range(10 * i, 10 * i + 2)))
    assert t.checkpoint_versions() == [2, 4]
    assert t.read(spark).count() == 12


def test_overwrite_schema_replaces_partitioning(spark, table_path):
    """overwrite_schema (delta-spark's overwriteSchema): one overwrite
    replaces BOTH schema and partition layout; plain appends then
    inherit the new partitioning; misuse refuses loudly."""
    t = DeltaTable(table_path)
    t.write(events_df(spark, range(8)))
    assert t.snapshot().partition_columns == []
    newdf = events_df(spark, range(100, 106)).withColumn(
        "bucket", (F.col("event_id") % 2).cast("string")
    )
    t.write(newdf, mode="overwrite", partition_by=["bucket"],
            overwrite_schema=True)
    snap = t.snapshot()
    assert snap.partition_columns == ["bucket"]
    assert all(set(pv) == {"bucket"} for pv in snap.partition_values.values())
    assert t.read(spark).count() == 6
    # appends now inherit the new partitioning
    t.write(events_df(spark, range(200, 202)).withColumn("bucket", F.lit("9")))
    assert t.read(spark).where("bucket = '9'").count() == 2
    # guards
    with pytest.raises(DeltaProtocolError, match="requires mode"):
        t.write(newdf, partition_by=["bucket"], overwrite_schema=True)
    with pytest.raises(DeltaProtocolError, match="conflicts with"):
        t.write(newdf.withColumnRenamed("bucket", "b2"), partition_by=["b2"])


def test_history_surface(spark, table_path):
    """DESCRIBE HISTORY: newest-first (version, timestamp, operation)
    from commitInfo; limit honored; expired versions drop out."""
    t = DeltaTable(table_path)
    t.write(events_df(spark, range(4)))
    t.write(events_df(spark, range(4, 6)))
    t.delete_where(spark, "event_id = 0")
    h = t.history()
    assert [r["version"] for r in h] == [2, 1, 0]
    assert h[0]["operation"] == "DELETE"
    assert h[2]["operation"] == "APPEND"
    assert all(r["timestamp"] is not None for r in h)
    assert [r["version"] for r in t.history(limit=1)] == [2]
    t.checkpoint()
    t.expire_log()
    assert t.history() == []  # commitInfo gone with the expired JSONs


def test_expire_log_cleans_expired_crc_sidecars(spark, table_path):
    """Expired .crc sidecars go with their commits; the horizon
    version's stays and still validates the checkpoint-bootstrapped
    snapshot."""
    t = DeltaTable(table_path)
    t.write(events_df(spark, range(4)))
    t.write(events_df(spark, range(4, 6)))
    t.checkpoint()
    t.expire_log()
    crcs = sorted(n for n in t.fs.listdir(t.log_dir) if n.endswith(".crc"))
    assert crcs == ["00000000000000000001.crc"]
    t2 = DeltaTable(table_path)
    assert t2.read(spark).count() == 6  # validated against the kept crc


def test_auto_compact_on_threshold(spark, table_path):
    """delta.autoOptimize.autoCompact: once the live file count reaches
    minNumFiles, the NEXT write bin-packs post-commit (dataChange=false
    — CDC still sees only the genuine inserts); unarmed tables never
    auto-compact."""
    t = DeltaTable(table_path)
    t.write(
        events_df(spark, range(2)).coalesce(1),
        configuration={"delta.autoOptimize.autoCompact": "true",
                       "delta.autoOptimize.minNumFiles": "4"},
    )
    for i in range(1, 4):
        t.write(events_df(spark, range(2 * i, 2 * i + 2)).coalesce(1))
    # 4th write hit the threshold: compacted to one file
    assert len(t.snapshot().files) == 1
    assert t.read(spark).count() == 8
    cdc = t.cdc(spark, start_version=0)
    assert cdc.count() == 8  # compaction commits are dataChange=false
    # unarmed: files accumulate
    p = DeltaTable(table_path + "_plain")
    for i in range(5):
        p.write(events_df(spark, range(10 * i, 10 * i + 2)).coalesce(1))
    assert len(p.snapshot().files) == 5


def test_ict_midlife_enablement_provenance_and_resolution(spark, tmp_path):
    """Arming ICT via ALTER (set_properties) on a table with pre-ICT
    history stamps the spec's enablement provenance properties on the
    enabling commit, upgrades the protocol with the inCommitTimestamp
    writer feature, and timestamp resolution splits history at the
    boundary: pre-enablement by wall timestamps, the ICT suffix by the
    (binary-searchable) in-commit timestamps."""
    t = DeltaTable(str(tmp_path / "ict_mid"))
    t.write(events_df(spark, range(3)))  # v0: no ICT
    v1 = t.set_properties({"delta.enableInCommitTimestamps": "true"})
    assert v1 == 1
    cfg = t.snapshot().configuration
    assert cfg["delta.inCommitTimestampEnablementVersion"] == "1"
    en_ts = int(cfg["delta.inCommitTimestampEnablementTimestamp"])
    (info,) = [a["commitInfo"] for a in t.actions(1) if "commitInfo" in a]
    assert int(info["inCommitTimestamp"]) == en_ts
    assert "inCommitTimestamp" in t.snapshot().protocol["writerFeatures"]
    t.write(events_df(spark, range(3, 8)))  # v2: ICT
    t.write(events_df(spark, range(8, 10)))  # v3: ICT
    icts = {v: t.commit_timestamp_ms(v) for v in (1, 2, 3)}
    assert icts[1] < icts[2] < icts[3]
    # suffix resolution: exact ICT hits and in-between points
    assert t.resolve_version(timestamp_ms=icts[2]) == 2
    assert t.resolve_version(timestamp_ms=icts[3] - 1) == 2
    assert t.resolve_version(timestamp_ms=icts[3] + 10) == 3
    # prefix resolution: v0 by wall timestamp
    assert t.resolve_version(timestamp_ms=t.commit_timestamp_ms(0)) == 0
    assert t.read(spark, timestamp_ms=icts[2]).count() == 8
    # binary search agrees with the linear definition everywhere
    all_ts = sorted(t.commit_timestamp_ms(v) for v in t.versions())
    for q in [ts + d for ts in all_ts for d in (-1, 0, 1)]:
        linear = [v for v in t.versions() if t.commit_timestamp_ms(v) <= q]
        expect = linear[-1] if linear else t.latest_version()
        assert t.resolve_version(timestamp_ms=q) == expect, q


def test_ict_handwritten_log_preview_feature_and_skewed_mtimes(spark, tmp_path):
    """A table written by ANOTHER writer: raw JSON log carrying the
    inCommitTimestamp-preview feature name and ICT values that disagree
    with file mtimes (all files written 'now'). Resolution must trust
    the in-commit timestamps, and our writer must accept the preview
    feature (same semantics, pre-GA name)."""
    root = str(tmp_path / "ict_ext")
    log = os.path.join(root, "_delta_log")
    os.makedirs(log)
    schema = json.dumps({"type": "struct", "fields": [
        {"name": "event_id", "type": "long", "nullable": True, "metadata": {}},
    ]})
    # one real parquet data file so reads materialize
    spark.createDataFrame([(1,), (2,)], "event_id long").coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "stage"))
    part = next(
        f for f in os.listdir(str(tmp_path / "stage")) if f.endswith(".parquet")
    )
    os.rename(str(tmp_path / "stage" / part), os.path.join(root, "part-0.parquet"))
    base_cfg = {"delta.enableInCommitTimestamps": "true",
                "delta.inCommitTimestampEnablementVersion": "0",
                "delta.inCommitTimestampEnablementTimestamp": "5000"}
    v0 = [
        {"commitInfo": {"timestamp": 99, "operation": "WRITE",
                        "inCommitTimestamp": 5000}},
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 7,
                      "writerFeatures": ["inCommitTimestamp-preview"]}},
        {"metaData": {"id": "m0", "format": {"provider": "parquet", "options": {}},
                      "schemaString": schema, "partitionColumns": [],
                      "configuration": base_cfg}},
        {"add": {"path": "part-0.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 99, "dataChange": True,
                 "stats": json.dumps({"numRecords": 2})}},
    ]
    v1 = [
        {"commitInfo": {"timestamp": 42, "operation": "DELETE",
                        "inCommitTimestamp": 9000}},
        {"remove": {"path": "part-0.parquet", "deletionTimestamp": 42,
                    "dataChange": True}},
    ]
    for v, acts in ((0, v0), (1, v1)):
        with open(os.path.join(log, f"{v:020d}.json"), "w") as f:
            for a in acts:
                f.write(json.dumps(a) + "\n")
    t = DeltaTable(root)
    # mtimes are "now" (way past 9000) — only ICT gives these answers
    assert t.resolve_version(timestamp_ms=5000) == 0
    assert t.resolve_version(timestamp_ms=8999) == 0
    assert t.resolve_version(timestamp_ms=9000) == 1
    assert t.read(spark, timestamp_ms=5000).count() == 2
    assert t.read(spark, timestamp_ms=9000).count() == 0
    # preview feature accepted by the writer guard: append commits, and
    # the new commit's ICT stays monotonic past the handwritten 9000
    t.write(events_df(spark, range(3)).select("event_id"))
    (info,) = [a["commitInfo"] for a in t.actions(2) if "commitInfo" in a]
    assert int(info["inCommitTimestamp"]) > 9000


def test_restore_to_timestamp_ict(spark, tmp_path):
    """RESTORE TO TIMESTAMP resolves through the same ICT-aware rule as
    time travel: on an in-commit-timestamps table, the target version
    comes from the commit-carried clock, not file mtimes (all 'now')."""
    t = DeltaTable(str(tmp_path / "rts"))
    t.write(
        events_df(spark, range(3)),
        configuration={"delta.enableInCommitTimestamps": "true"},
    )
    t.write(events_df(spark, range(3, 8)))
    t.write(events_df(spark, range(8, 10)))
    ict_v1 = t.commit_timestamp_ms(1)
    v = t.restore(timestamp_ms=ict_v1)
    assert v == 3
    assert t.read(spark).count() == 8  # v1 state: 3 + 5 rows
    import pytest

    with pytest.raises(DeltaProtocolError, match="exactly one"):
        t.restore()
    with pytest.raises(DeltaProtocolError, match="exactly one"):
        t.restore(1, timestamp_ms=ict_v1)


def test_history_operation_metrics(spark, tmp_path):
    """commitInfo.operationMetrics (delta-spark wire shape: string
    values) derived from the action list at zero extra cost; DESCRIBE
    HISTORY surfaces numFiles / numOutputRows / numRemovedFiles."""
    t = DeltaTable(str(tmp_path / "om"))
    t.write(events_df(spark, range(8)).repartition(2))
    t.delete_where(spark, "event_id < 2")
    hist = {h["version"]: h for h in t.history()}
    m0 = hist[0]["operationMetrics"]
    assert m0["numFiles"] == "2" and m0["numOutputRows"] == "8"
    m1 = hist[1]["operationMetrics"]
    assert int(m1["numRemovedFiles"]) >= 1
    assert int(m1["numOutputRows"]) == 6  # rewrite keeps the survivors


def test_convert_from_parquet_in_place(spark, tmp_path):
    """CONVERT TO DELTA: a hive-partitioned parquet directory becomes a
    delta table in place — no file rewritten, partition values
    discovered from the directory names, footer stats on every add so
    pruning works from v0, and the converted table is writable like any
    other."""
    import pytest

    root = str(tmp_path / "lake")
    src = spark.createDataFrame(
        [(i, "click" if i % 2 else "buy", float(i)) for i in range(40)],
        "event_id long, event_type string, value double",
    )
    src.write.partitionBy("event_type").parquet(root)
    before = sorted(
        os.path.relpath(p, root)
        for p, _, fs in os.walk(root) for p in
        [os.path.join(p, f) for f in fs if f.endswith(".parquet")]
    )
    t = DeltaTable(root)
    v = t.convert_from_parquet(spark)
    assert v == 0
    snap = t.snapshot()
    assert snap.partition_columns == ["event_type"]
    assert sorted(snap.files) == before  # same files, untouched
    got = t.read(spark)
    assert got.count() == 40
    assert {r.event_type for r in got.select("event_type").distinct().collect()} == {
        "click", "buy"
    }
    # partition + stats pruning live from v0
    pruned = t.prune_files(snap, [("event_type", "=", "buy")])
    assert 0 < len(pruned) < len(snap.files)
    assert t.read(spark, filters=[("value", ">=", 38.0)]).count() == 2
    # the converted table is a normal delta table: append + delete work
    t.write(src.limit(2), mode="append", partition_by=["event_type"])
    assert t.read(spark).count() == 42
    with pytest.raises(DeltaProtocolError, match="already a delta"):
        t.convert_from_parquet(spark)


def test_vacuum_dry_run_and_retention_property(spark, tmp_path):
    """VACUUM DRY RUN returns the would-delete list without touching a
    file; retention defaults from delta.deletedFileRetentionDuration
    ("interval N days", delta-spark spelling) and unparseable values
    refuse loudly rather than silently using the default."""
    import pytest

    t = DeltaTable(str(tmp_path / "v"))
    t.write(
        events_df(spark, range(6)).coalesce(1),
        configuration={"delta.deletedFileRetentionDuration": "interval 0 seconds"},
    )
    t.write(events_df(spark, range(6, 9)).coalesce(1), mode="overwrite")
    would = t.vacuum(dry_run=True)  # property: 0s retention → eligible
    assert len(would) == 1
    assert all(os.path.exists(os.path.join(str(tmp_path / "v"), p)) for p in would)
    gone = t.vacuum()
    assert sorted(gone) == sorted(would)
    assert not os.path.exists(os.path.join(str(tmp_path / "v"), gone[0]))
    # explicit retention still wins over the property
    assert t.vacuum(retention_ms=10**12) == []
    # unparseable property fails loudly
    t2 = DeltaTable(str(tmp_path / "v2"))
    t2.write(
        events_df(spark, range(3)),
        configuration={"delta.deletedFileRetentionDuration": "fortnight-ish"},
    )
    with pytest.raises(DeltaProtocolError, match="unparseable interval"):
        t2.vacuum()


def test_ict_timestamp_travel_refuses_expired_history(spark, table_path):
    """After expire_log removes the prefix of an in-commit-timestamp
    region, the binary search must never steer on checkpoint/mtime
    approximations (non-monotone vs ICTs): timestamps landing in the
    expired prefix refuse LOUDLY, timestamps in the live suffix still
    resolve exactly, O(log n)."""
    t = DeltaTable(table_path)
    t.write(
        events_df(spark, range(3)),
        configuration={"delta.enableInCommitTimestamps": "true"},
    )
    for lo in range(3, 18, 3):
        t.write(events_df(spark, range(lo, lo + 3)))
    ict = {v: t.commit_timestamp_ms(v) for v in t.versions()}
    assert list(ict) == list(range(6))
    # checkpoint an INTERMEDIATE version, then expire its prefix
    t.checkpoint(version=2)
    expired = t.expire_log()
    assert expired == [0, 1, 2]
    t2 = DeltaTable(table_path)  # fresh handle, no cached state
    # live suffix still timestamp-addressable, exactly
    assert t2.resolve_version(timestamp_ms=ict[4]) == 4
    assert t2.resolve_version(timestamp_ms=ict[5] + 10_000) == 5
    assert t2.resolve_version(timestamp_ms=ict[3]) == 3
    # expired prefix: loud refusal, never a silently-wrong version
    with pytest.raises(DeltaProtocolError, match="expired"):
        t2.resolve_version(timestamp_ms=ict[1])
    with pytest.raises(DeltaProtocolError, match="expired"):
        t2.resolve_version(timestamp_ms=ict[0] - 1)


def test_checkpoint_protection_boundary(spark, table_path):
    """checkpointProtection (spec "Checkpoint Protection", stamped by
    CLONEs that graft history): commits below
    delta.requireCheckpointProtectionBeforeVersion may only be expired
    when the whole protected prefix is truncated in ONE sweep reaching
    the boundary, and no new checkpoint may be created below it.
    Ordinary writes stay allowed (the feature is metadata-plane)."""
    t = DeltaTable(table_path)
    for lo in range(0, 12, 3):
        t.write(events_df(spark, range(lo, lo + 3)))  # v0..v3
    # arming the property performs the protocol handshake
    v_prop = t.set_properties(
        {"delta.requireCheckpointProtectionBeforeVersion": "3"}
    )  # v4
    snap = t.snapshot()
    assert "checkpointProtection" in snap.protocol["writerFeatures"]
    # ordinary data commits remain allowed on the protected table
    t.write(events_df(spark, range(12, 15)))  # v5
    # a checkpoint BELOW the boundary is forbidden
    with pytest.raises(DeltaProtocolError, match="protection boundary"):
        t.checkpoint(version=1)
    import glob as _glob

    t2 = DeltaTable(table_path)
    t2.checkpoint(version=v_prop)  # >= boundary: allowed
    expired = t2.expire_log()
    assert set(expired) == {0, 1, 2, 3, 4}
    assert t2.read(spark).count() == 15
    assert not _glob.glob(
        os.path.join(table_path, "_delta_log", "00000000000000000000.json")
    )


def test_checkpoint_protection_refuses_partial_sweep(spark, table_path):
    """A checkpoint CREATED BEFORE protection was armed sits below the
    boundary; expiring up to it would strip protected history piecemeal
    — the sweep must refuse until a checkpoint at/through the boundary
    exists."""
    t = DeltaTable(table_path)
    for lo in range(0, 9, 3):
        t.write(events_df(spark, range(lo, lo + 3)))  # v0..v2
    t.checkpoint()  # checkpoint at v2, pre-protection
    t.set_properties(
        {"delta.requireCheckpointProtectionBeforeVersion": "99"}
    )  # v3: everything so far is protected
    with pytest.raises(DeltaProtocolError, match="partial cleanup"):
        t.expire_log()
    # history intact after the refusal
    assert DeltaTable(table_path).versions()[0] == 0
    assert DeltaTable(table_path).read(spark).count() == 9


def test_reader_gates_collations_and_variant_shredding(spark, tmp_path):
    """2024+ reader-plane features we do NOT implement must refuse
    loudly by name, never silently mis-read: collations (preview) and
    variant shredding change comparison/physical-layout semantics."""
    for feature in ("collations-preview", "variantShredding-preview"):
        root = str(tmp_path / feature)
        os.makedirs(os.path.join(root, "_delta_log"))
        df = events_df(spark, range(2))
        df.coalesce(1).write.parquet(os.path.join(root, "data"))
        part = next(
            f
            for f in os.listdir(os.path.join(root, "data"))
            if f.endswith(".parquet")
        )
        actions = [
            {"commitInfo": {"timestamp": 1700000000000, "operation": "WRITE"}},
            {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                          "readerFeatures": [feature],
                          "writerFeatures": [feature]}},
            {"metaData": {"id": "x", "schemaString": df.schema.json(),
                          "partitionColumns": []}},
            {"add": {"path": f"data/{part}", "partitionValues": {},
                     "size": 1, "modificationTime": 1700000000000,
                     "dataChange": True}},
        ]
        with open(os.path.join(root, "_delta_log", f"{0:020d}.json"), "w") as f:
            for a in actions:
                f.write(json.dumps(a) + "\n")
        with pytest.raises(DeltaProtocolError, match=feature):
            DeltaTable(root).read(spark).count()


def test_writer_gates_commit_coordination_features(spark, tmp_path):
    """Writer-plane sweep counterpart of the reader gate test: a table
    whose protocol demands commit coordination we do not implement
    (catalogOwned-preview / coordinatedCommits-preview) must refuse
    WRITES loudly by feature name — committing around a coordinator
    could fork the log. Reads of such tables stay allowed (the features
    are writer-plane)."""
    for feature in ("catalogOwned-preview", "coordinatedCommits-preview"):
        root = str(tmp_path / feature)
        os.makedirs(os.path.join(root, "_delta_log"))
        df = events_df(spark, range(2))
        df.coalesce(1).write.parquet(os.path.join(root, "data"))
        part = next(
            f
            for f in os.listdir(os.path.join(root, "data"))
            if f.endswith(".parquet")
        )
        actions = [
            {"commitInfo": {"timestamp": 1700000000000, "operation": "WRITE"}},
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 7,
                          "writerFeatures": [feature]}},
            {"metaData": {"id": "x", "schemaString": df.schema.json(),
                          "partitionColumns": []}},
            {"add": {"path": f"data/{part}", "partitionValues": {},
                     "size": 1, "modificationTime": 1700000000000,
                     "dataChange": True}},
        ]
        with open(os.path.join(root, "_delta_log", f"{0:020d}.json"), "w") as f:
            for a in actions:
                f.write(json.dumps(a) + "\n")
        t = DeltaTable(root)
        assert t.read(spark).count() == 2  # reads fine
        with pytest.raises(DeltaProtocolError, match=feature.split("-")[0]):
            t.write(events_df(spark, range(2, 4)))


def test_collated_columns_pass_through_or_refuse_by_name(spark, tmp_path):
    """Collations preview (round 12, VERDICT r11 #9): a handwritten log
    whose schema collates a column UTF8_BINARY reads identically
    (bytes unchanged, binary semantics = this engine's semantics); any
    NON-binary collation refuses by column and collation name — this
    engine would otherwise evaluate comparisons binary-wise and prune
    on stats whose min/max follow a different ordering."""

    def mk(root, collations):
        os.makedirs(os.path.join(root, "_delta_log"))
        df = spark.createDataFrame(
            [(1, "Apple"), (2, "apple"), (3, "Banana")], "k long, s string"
        )
        df.coalesce(1).write.parquet(os.path.join(root, "data"))
        part = next(
            f for f in os.listdir(os.path.join(root, "data"))
            if f.endswith(".parquet")
        )
        schema = {
            "type": "struct",
            "fields": [
                {"name": "k", "type": "long", "nullable": True, "metadata": {}},
                {"name": "s", "type": "string", "nullable": True,
                 "metadata": {"__COLLATIONS": collations}},
            ],
        }
        actions = [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 7,
                          "writerFeatures": ["collations-preview"]}},
            {"metaData": {"id": "c", "schemaString": json.dumps(schema),
                          "partitionColumns": [], "configuration": {}}},
            {"add": {"path": f"data/{part}", "partitionValues": {},
                     "size": 1, "modificationTime": 1700000000000,
                     "dataChange": True}},
        ]
        with open(os.path.join(root, "_delta_log", f"{0:020d}.json"), "w") as f:
            for a in actions:
                f.write(json.dumps(a) + "\n")
        return DeltaTable(root)

    # UTF8_BINARY (any provider): metadata-only pass-through
    t1 = mk(str(tmp_path / "bin"), {"s": "SPARK.UTF8_BINARY"})
    got = t1.read(spark)
    assert got.count() == 3
    assert {r.s for r in got.collect()} == {"Apple", "apple", "Banana"}
    # and binary comparison semantics apply unchanged
    assert got.where(F.col("s") == "apple").count() == 1

    # UTF8_BINARY tables are also WRITABLE (binary ordering IS the
    # collation ordering, so footer stats stay sound)
    t1.write(spark.createDataFrame([(4, "cherry")], "k long, s string"))
    assert t1.read(spark).count() == 4

    # non-binary collation: refuses by name, batch AND stream
    t2 = mk(str(tmp_path / "icu"), {"s": "ICU.en_US"})
    with pytest.raises(DeltaProtocolError, match="ICU.en_US"):
        t2.write(spark.createDataFrame([(9, "x")], "k long, s string"))
    with pytest.raises(DeltaProtocolError, match="ICU.en_US"):
        t2.read(spark).count()
    from pulsar_io_delta_spark.sources.datasource import register_delta_cdc

    register_delta_cdc(spark)
    with pytest.raises(Exception, match="ICU.en_US|collated"):
        (spark.read.format("pulsar_delta_cdc")
         .option("tablePath", str(tmp_path / "icu")).load().count())


def test_ict_enablement_version_beyond_retained_refuses(spark, tmp_path):
    """ADVICE r11: a foreign writer (or corrupt property) claiming ICT
    enablement at a version beyond every retained commit used to
    IndexError inside _resolve_timestamp; now it refuses by name."""
    root = str(tmp_path / "ict_bad")
    log = os.path.join(root, "_delta_log")
    os.makedirs(log)
    schema = json.dumps({"type": "struct", "fields": [
        {"name": "event_id", "type": "long", "nullable": True, "metadata": {}},
    ]})
    cfg = {"delta.enableInCommitTimestamps": "true",
           "delta.inCommitTimestampEnablementVersion": "999"}
    v0 = [
        {"commitInfo": {"timestamp": 99, "operation": "WRITE",
                        "inCommitTimestamp": 5000}},
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 7,
                      "writerFeatures": ["inCommitTimestamp"]}},
        {"metaData": {"id": "m0", "format": {"provider": "parquet", "options": {}},
                      "schemaString": schema, "partitionColumns": [],
                      "configuration": cfg}},
    ]
    with open(os.path.join(log, f"{0:020d}.json"), "w") as f:
        for a in v0:
            f.write(json.dumps(a) + "\n")
    t = DeltaTable(root)
    with pytest.raises(DeltaProtocolError, match="exceeds every retained"):
        t.resolve_version(timestamp_ms=5000)
    # version addressing still works
    assert t.resolve_version(version=0) == 0


def test_domain_metadata_user_api_roundtrip(spark, table_path):
    """Domain Metadata user API (round 13, VERDICT r12 #9): SET
    auto-upgrades the protocol (merging prior features), replay is
    last-wins, removal tombstones drop the domain, and checkpoints
    preserve live domains across log expiry."""
    t = DeltaTable(table_path)
    t.write(events_df(spark, range(4)))
    assert t.domain_metadata() == {}
    t.set_domain_metadata("myapp.ingest", '{"cursor": 5}')
    p = t.snapshot().protocol
    assert "domainMetadata" in p["writerFeatures"]
    assert t.domain_metadata() == {"myapp.ingest": '{"cursor": 5}'}
    # domains survive ordinary data commits
    t.write(events_df(spark, range(4, 7)))
    assert t.domain_metadata() == {"myapp.ingest": '{"cursor": 5}'}
    # last-wins on re-set
    t.set_domain_metadata("myapp.ingest", '{"cursor": 9}')
    t.set_domain_metadata("myapp.flags", "beta")
    assert t.domain_metadata() == {
        "myapp.flags": "beta",
        "myapp.ingest": '{"cursor": 9}',
    }
    # checkpoint preservation: replay exclusively from the checkpoint
    t.checkpoint()
    t.expire_log()
    assert t.domain_metadata() == {
        "myapp.flags": "beta",
        "myapp.ingest": '{"cursor": 9}',
    }
    # removal tombstone drops it, and survives the NEXT checkpoint too
    t.remove_domain_metadata("myapp.flags")
    assert t.domain_metadata() == {"myapp.ingest": '{"cursor": 9}'}
    t.checkpoint()
    t.expire_log()
    assert t.domain_metadata() == {"myapp.ingest": '{"cursor": 9}'}
    # data unaffected throughout
    assert t.read(spark).count() == 7


def test_domain_metadata_guards(spark, table_path):
    """System ('delta.'-prefixed) domains refuse via the user API, and
    removing an absent domain refuses loudly (a typo must never look
    like a successful removal)."""
    t = DeltaTable(table_path)
    t.write(events_df(spark, range(3)))
    with pytest.raises(DeltaProtocolError, match="system-controlled"):
        t.set_domain_metadata("delta.clustering", "{}")
    with pytest.raises(DeltaProtocolError, match="system-controlled"):
        t.remove_domain_metadata("delta.rowTracking")
    with pytest.raises(DeltaProtocolError, match="not set on this table"):
        t.remove_domain_metadata("myapp.ghost")
    with pytest.raises(DeltaProtocolError, match="non-empty"):
        t.set_domain_metadata("", "x")
    with pytest.raises(DeltaProtocolError, match="must be a string"):
        t.set_domain_metadata("myapp.cfg", {"not": "a string"})


def test_domain_metadata_foreign_handwritten_log_preserved(spark, tmp_path):
    """A domain written by ANOTHER writer (handwritten log) replays,
    survives our checkpoint + data commits (spec: writers preserve
    domains they don't own), and stays untouchable via the user API
    when system-prefixed."""
    root = str(tmp_path / "hand")
    os.makedirs(os.path.join(root, "_delta_log"))
    df = events_df(spark, range(5))
    df.coalesce(1).write.parquet(os.path.join(root, "data"))
    part = next(
        f for f in os.listdir(os.path.join(root, "data")) if f.endswith(".parquet")
    )
    schema = df.schema.json()
    actions = [
        {"commitInfo": {"timestamp": 1700000000000, "operation": "WRITE"}},
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 7,
                      "writerFeatures": ["domainMetadata"]}},
        {"metaData": {"id": "x", "format": {"provider": "parquet", "options": {}},
                      "schemaString": schema, "partitionColumns": [],
                      "configuration": {}}},
        {"add": {"path": f"data/{part}", "partitionValues": {}, "size": 1,
                 "modificationTime": 1700000000000, "dataChange": True}},
        {"domainMetadata": {"domain": "delta.someVendorFeature",
                            "configuration": '{"opaque": true}',
                            "removed": False}},
        {"domainMetadata": {"domain": "acme.notes", "configuration": "v1",
                            "removed": False}},
    ]
    with open(os.path.join(root, "_delta_log", f"{0:020d}.json"), "w") as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")
    t = DeltaTable(root)
    assert t.domain_metadata() == {
        "acme.notes": "v1",
        "delta.someVendorFeature": '{"opaque": true}',
    }
    # our data commit + checkpoint + expiry must PRESERVE both domains
    t.write(events_df(spark, range(5, 8)))
    t.checkpoint()
    t.expire_log()
    assert t.domain_metadata() == {
        "acme.notes": "v1",
        "delta.someVendorFeature": '{"opaque": true}',
    }
    # the foreign system domain stays untouchable via the user API
    with pytest.raises(DeltaProtocolError, match="system-controlled"):
        t.set_domain_metadata("delta.someVendorFeature", "{}")
    # but the user domain another writer created is ours to manage
    t.remove_domain_metadata("acme.notes")
    assert t.domain_metadata() == {
        "delta.someVendorFeature": '{"opaque": true}'
    }
