"""REORG ... APPLY (PURGE): materialize deletion vectors into clean
files. Completes the merge-on-read lifecycle the reference reader
predates (DeltaReader.java:301-303): DELETE writes the bitmap, PURGE
rewrites only DV-carrying files, VACUUM reclaims the dead bitmap and
the superseded data file.
"""

import glob
import os

import pytest
from pyspark.sql import functions as F

from pulsar_io_delta_spark.sources.delta_log import DeltaTable
from pulsar_io_delta_spark.tables import table


@pytest.fixture()
def tbl(spark, sf_dir, tmp_path):
    e = table(spark, str(sf_dir), "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    t = DeltaTable(str(tmp_path / "t"))
    t.write(e, partition_by=["event_type"])
    return t


def test_purge_rewrites_only_dv_files(spark, tbl):
    # DV-delete is partition-prunable: only 'error' files get bitmaps
    tbl.delete_where_dv(
        spark, "value < 0.5", filters=[("event_type", "=", "error")]
    )
    before = tbl.snapshot()
    clean_before = {p for p in before.files if not before.adds[p].get("deletionVector")}
    dirty = set(before.files) - clean_before
    assert dirty, "fixture must produce at least one DV file"
    expect = tbl.read(spark)
    rows_before = expect.count()

    tbl.reorg_purge(spark)
    after = tbl.snapshot()
    # untouched files keep their identity; no live add carries a DV
    assert clean_before <= set(after.files)
    assert not any(after.adds[p].get("deletionVector") for p in after.files)
    assert tbl.read(spark).count() == rows_before
    assert tbl.read(spark).exceptAll(expect).count() == 0


def test_purge_is_data_change_false_for_cdc(spark, tmp_path, sf_dir):
    e = table(spark, str(sf_dir), "events").select("event_id", "value")
    t = DeltaTable(str(tmp_path / "cdc"))
    t.write(e, configuration={"delta.enableChangeDataFeed": "true"})
    t.delete_where_dv(spark, "value < 0.3")
    v = t.reorg_purge(spark)
    # a purge commit re-adds every surviving row; CDC must NOT re-emit
    # them as inserts (dataChange=false, same contract as OPTIMIZE) —
    # a range holding ONLY the purge commit fails loudly, exactly like
    # a pure-OPTIMIZE range
    from pulsar_io_delta_spark.sources.delta_log import DeltaProtocolError

    with pytest.raises(DeltaProtocolError, match="no data-changing"):
        t.table_changes(spark, v, v)
    # and a range spanning delete+purge reports only the delete's rows
    deletes = t.table_changes(spark, 1, v)
    assert deletes.where(F.col("_change_type") != "delete").count() == 0
    adds = [a["add"] for a in t.actions(v) if "add" in a]
    removes = [a["remove"] for a in t.actions(v) if "remove" in a]
    assert adds and removes
    assert all(a["dataChange"] is False for a in adds)
    assert all(r["dataChange"] is False for r in removes)
    # the remove carries the purged descriptor (vacuum accounting)
    assert all(r.get("deletionVector") for r in removes)


def test_purge_then_vacuum_reclaims_bitmap_and_file(spark, tbl):
    tbl.delete_where_dv(spark, "value < 0.5")
    expect = tbl.read(spark).count()
    tbl.reorg_purge(spark)
    deleted = tbl.vacuum(retention_ms=-1)
    assert any(d.endswith(".parquet") for d in deleted)  # superseded data
    assert any("deletion_vector_" in d for d in deleted)  # dead bitmap
    assert not [
        f
        for f in glob.glob(os.path.join(tbl.path, "**", "deletion_vector_*.bin"),
                           recursive=True)
    ]
    assert tbl.read(spark).count() == expect


def test_purge_noop_without_dvs(spark, tbl):
    v0 = tbl.snapshot().version
    v = tbl.reorg_purge(spark)
    assert v == v0 + 1
    assert not [a for a in tbl.actions(v) if "add" in a or "remove" in a]
