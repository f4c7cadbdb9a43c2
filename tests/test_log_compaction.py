"""Minor log compaction (Delta PROTOCOL.md "Log Compaction Files"):
``<start>.<end>.compacted.json`` stands in for the range's commits
during snapshot replay — one file read instead of end-start+1 — without
touching the commit files themselves (foreign readers that predate the
feature ignore it: its stem is not a bare version number).
"""

import pytest
from pyspark.sql import functions as F

from pulsar_io_delta_spark.sources.delta_log import DeltaProtocolError, DeltaTable


@pytest.fixture()
def tbl(spark, tmp_path):
    """7 commits: creates (v0), appends, a delete rewrite (v3), a
    property-carrying append table, a DV delete (v5), an append (v6)."""
    t = DeltaTable(str(tmp_path / "t"))
    mk = lambda lo, n: spark.range(lo, lo + n).select(  # noqa: E731
        F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
    )
    t.write(mk(0, 20).coalesce(2))            # v0
    t.write(mk(100, 10).coalesce(1))          # v1
    t.write(mk(200, 10).coalesce(1))          # v2
    t.delete_where(spark, "k >= 205")         # v3 (rewrite: remove+add)
    t.write(mk(300, 5).coalesce(1))           # v4
    t.delete_where_dv(spark, "k = 1")         # v5 (same-path re-add + DV)
    t.write(mk(400, 5).coalesce(1))           # v6
    return t


def _snap_key(s):
    return (s.version, s.files, s.schema_string, s.configuration,
            s.protocol, {p: s.adds[p] for p in s.files}, s.domain_metadata)


def test_compacted_replay_is_equivalent_and_used(spark, tbl, monkeypatch):
    before = _snap_key(tbl.snapshot())
    name = tbl.compact_log(1, 5)
    assert name == f"{1:020d}.{5:020d}.compacted.json"
    read_versions: list[int] = []
    orig = DeltaTable.actions

    def spy(self, version):
        read_versions.append(version)
        return orig(self, version)

    monkeypatch.setattr(DeltaTable, "actions", spy)
    after = _snap_key(tbl.snapshot())
    assert after == before
    # the range's commit files were NOT opened during replay
    assert not any(1 <= v <= 5 for v in read_versions)
    assert {0, 6} <= set(read_versions)
    # rows identical through the compacted replay
    assert tbl.read(spark).count() == 20 + 10 + 10 - 5 + 5 - 1 + 5


def test_compaction_respects_time_travel_boundary(spark, tbl):
    # a range file ENDING past the asked version must not be used —
    # v4 replay with a 1..5 compaction falls back to per-commit reads
    tbl.compact_log(1, 5)
    s4 = tbl.snapshot(4)
    assert tbl.read(spark, version=4).count() == 20 + 10 + 10 - 5 + 5
    assert s4.version == 4


def test_compaction_requires_contiguous_range(tbl):
    with pytest.raises(DeltaProtocolError, match="contiguous"):
        tbl.compact_log(3, 99)
    with pytest.raises(DeltaProtocolError, match="contiguous"):
        tbl.compact_log(5, 3)


def test_widest_range_wins_and_tombstones_survive(spark, tbl):
    tbl.compact_log(1, 3)
    tbl.compact_log(1, 5)
    import os

    # vacuum accounting: the net-removed files' tombstones are in the
    # wide range file (delete_where at v3 removed+rewrote)
    wide = os.path.join(tbl.log_dir, f"{1:020d}.{5:020d}.compacted.json")
    import json as _j

    acts = [_j.loads(line) for line in open(wide)]
    assert any("remove" in a for a in acts)
    assert _snap_key(tbl.snapshot()) == _snap_key(tbl.snapshot())  # stable
    assert tbl.read(spark).count() == 44


def test_expire_log_honors_log_retention_property(spark, tmp_path):
    """delta.logRetentionDuration: a checkpointed commit younger than
    the retention window must SURVIVE expire_log (delta-spark's rule:
    expiry needs checkpointed AND aged); retention 0 / absent keeps the
    explicit-maintenance behavior of expiring everything checkpointed."""
    from pulsar_io_delta_spark.sources.delta_log import DeltaTable

    mk = lambda n: spark.range(n).select(  # noqa: E731
        F.col("id").alias("event_id"), (F.col("id") * 1.5).alias("value")
    )
    t = DeltaTable(str(tmp_path / "lr"))
    t.write(
        mk(6),
        configuration={"delta.logRetentionDuration": "interval 1 week"},
    )
    t.write(mk(3), mode="append")
    t.checkpoint()
    assert t.expire_log() == []  # both commits are seconds old
    assert t.json_versions() == [0, 1]
    # explicit retention 0 overrides the property (maintenance sweep)
    assert t.expire_log(retention_ms=0) == [0, 1]
    assert t.read(spark).count() == 9  # checkpoint bootstrap still works
