"""Metadata-only RENAME/DROP COLUMN on name-mode mapped tables — the
point of column mapping: logical names change in the schemaString while
physicalName/columnMapping.id stay, so no file is touched at any table
size. Unmapped tables refuse loudly (a rename there would need a
rewrite).
"""

import pytest
from pyspark.sql import functions as F

from pulsar_io_delta_spark.sources.delta_log import DeltaProtocolError, DeltaTable


@pytest.fixture()
def tbl(spark, tmp_path):
    t = DeltaTable(str(tmp_path / "t"))
    t.write(
        spark.range(20).select(
            F.col("id").alias("k"),
            (F.col("id") * 2.0).alias("v"),
            F.lit("x").alias("tag"),
        )
    )
    t.enable_column_mapping()
    return t


def test_rename_is_metadata_only_and_round_trips(spark, tbl):
    files_before = set(tbl.snapshot().files)
    tbl.rename_column("v", "score")
    assert set(tbl.snapshot().files) == files_before  # zero data churn
    df = tbl.read(spark)
    assert set(df.columns) == {"k", "score", "tag"}
    assert df.agg(F.sum("score")).collect()[0][0] == sum(i * 2.0 for i in range(20))
    # appends under the new name land in the same physical column
    tbl.write(
        spark.range(100, 103).select(
            F.col("id").alias("k"),
            (F.col("id") * 2.0).alias("score"),
            F.lit("y").alias("tag"),
        )
    )
    assert tbl.read(spark).where("score >= 200").count() == 3
    # time travel BEFORE the rename still shows the old name
    assert "v" in tbl.read(spark, version=1).columns


def test_drop_is_metadata_only_and_rewrites_skip_it(spark, tbl):
    files_before = set(tbl.snapshot().files)
    tbl.drop_column("tag")
    assert set(tbl.snapshot().files) == files_before
    df = tbl.read(spark)
    assert set(df.columns) == {"k", "v"}
    assert df.count() == 20
    # a later rewrite (compact) writes files WITHOUT the dropped column
    tbl.compact(spark)
    assert set(tbl.read(spark).columns) == {"k", "v"}
    assert tbl.read(spark).count() == 20


def test_guards(spark, tmp_path, tbl):
    plain = DeltaTable(str(tmp_path / "plain"))
    plain.write(spark.range(3).select(F.col("id").alias("k"), F.lit(1).alias("v")))
    with pytest.raises(DeltaProtocolError, match="column mapping"):
        plain.rename_column("v", "w")
    with pytest.raises(DeltaProtocolError, match="column mapping"):
        plain.drop_column("v")
    with pytest.raises(DeltaProtocolError, match="no such column"):
        tbl.rename_column("nope", "w")
    with pytest.raises(DeltaProtocolError, match="already exists"):
        tbl.rename_column("v", "k")
    with pytest.raises(DeltaProtocolError, match="no such column"):
        tbl.drop_column("nope")


def test_guard_referenced_by_constraint(spark, tmp_path):
    t = DeltaTable(str(tmp_path / "c"))
    t.write(
        spark.range(5).select(F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")),
        configuration={"delta.constraints.vpos": "v >= 0"},
    )
    t.enable_column_mapping()
    with pytest.raises(DeltaProtocolError, match="constraint"):
        t.drop_column("v")
    with pytest.raises(DeltaProtocolError, match="constraint"):
        t.rename_column("v", "w")
