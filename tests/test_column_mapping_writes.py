"""Column-mapped table WRITE paths (round 8): every staging path
(append / overwrite / merge / delete rewrite / DV delete / OPTIMIZE)
on a name-mode mapped table must put PHYSICAL column names in data
files and hive partition dirs, keep add-action partitionValues keyed
physical, and still present LOGICAL names to every reader.

Format authority: the public Delta protocol spec (delta-io/delta
PROTOCOL.md "Column Mapping") — physical names live in parquet files
and partitionValues; logical names live only in the schemaString. The
reference reader (DeltaReader.java:301-303) predates column mapping.
"""

import json
import os

import pytest

from pulsar_io_delta_spark.sources.delta_log import (
    DeltaProtocolError,
    DeltaTable,
)

SCHEMA = json.dumps(
    {
        "type": "struct",
        "fields": [
            {"name": "event_id", "type": "long", "nullable": True,
             "metadata": {"delta.columnMapping.physicalName": "p_1"}},
            {"name": "category", "type": "string", "nullable": True,
             "metadata": {"delta.columnMapping.physicalName": "p_2"}},
            {"name": "value", "type": "double", "nullable": True,
             "metadata": {"delta.columnMapping.physicalName": "p_3"}},
        ],
    }
)


@pytest.fixture
def mapped_table(tmp_path):
    """An EMPTY name-mode mapped table (handwritten v0: protocol +
    metaData, no data) — partitionColumns are LOGICAL names per spec."""
    root = str(tmp_path / "cm")
    actions = [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["columnMapping"],
                      "writerFeatures": ["columnMapping"]}},
        {"metaData": {"id": "cm-w", "schemaString": SCHEMA,
                      "partitionColumns": ["category"],
                      "format": {"provider": "parquet", "options": {}},
                      "configuration": {"delta.columnMapping.mode": "name"}}},
    ]
    os.makedirs(os.path.join(root, "_delta_log"))
    with open(os.path.join(root, "_delta_log", f"{0:020d}.json"), "w") as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")
    return DeltaTable(root)


def _rows(spark, ids, cat="a"):
    return spark.createDataFrame(
        [(i, cat, float(i)) for i in ids],
        "event_id long, category string, value double",
    )


def _data_files(t):
    out = []
    for dirpath, _dirs, names in os.walk(t.path):
        if "_delta_log" in dirpath:
            continue
        out.extend(os.path.join(dirpath, n) for n in names if n.endswith(".parquet"))
    return out


def test_append_stages_physical_names(spark, mapped_table):
    t = mapped_table
    t.write(_rows(spark, range(5), "a"), partition_by=["category"])
    t.write(_rows(spark, range(5, 8), "b"), partition_by=["category"])
    # reader surface: logical names, all rows
    out = t.read(spark)
    assert set(out.columns) == {"event_id", "category", "value"}
    assert {(r.event_id, r.category) for r in out.collect()} == {
        (i, "a") for i in range(5)
    } | {(i, "b") for i in range(5, 8)}
    # disk surface: physical names in files AND partition dirs
    files = _data_files(t)
    assert files
    for fp in files:
        raw = spark.read.parquet(fp)
        assert "p_1" in raw.columns and "event_id" not in raw.columns
        assert "p_2=" in fp and "category=" not in fp
    # add-action partitionValues keyed by PHYSICAL name (spec shape)
    snap = t.snapshot()
    for p in snap.files:
        pv = snap.partition_values[p]
        assert set(pv) == {"p_2"}, pv


def test_partition_filter_prunes_on_logical_name(spark, mapped_table):
    t = mapped_table
    t.write(_rows(spark, range(5), "a"), partition_by=["category"])
    t.write(_rows(spark, range(5, 9), "b"), partition_by=["category"])
    snap = t.snapshot()
    pruned = t.prune_files(snap, t._phys_filters(snap, [("category", "=", "b")]))
    assert 0 < len(pruned) < len(snap.files)
    got = t.read(spark, filters=[("category", "=", "b")])
    assert {r.event_id for r in got.collect()} == {5, 6, 7, 8}


def test_overwrite_and_compact_keep_physical_staging(spark, mapped_table):
    t = mapped_table
    t.write(_rows(spark, range(4)), partition_by=["category"])
    t.write(_rows(spark, range(100, 104)), mode="overwrite",
            partition_by=["category"])
    t.compact(spark, target_files=1)
    out = t.read(spark)
    assert {r.event_id for r in out.collect()} == set(range(100, 104))
    for fp in _data_files(t):
        assert "event_id" not in spark.read.parquet(fp).columns


def test_merge_upsert_on_mapped_table(spark, mapped_table):
    t = mapped_table
    t.write(_rows(spark, range(6)), partition_by=["category"])
    src = spark.createDataFrame(
        [(4, "a", 400.0), (10, "a", 10.0)],
        "event_id long, category string, value double",
    )
    t.merge_upsert(spark, src, key_cols=["event_id"])
    got = {r.event_id: r.value for r in t.read(spark).collect()}
    assert got[4] == 400.0 and got[10] == 10.0 and len(got) == 7


def test_delete_where_rewrite_on_mapped_table(spark, mapped_table):
    t = mapped_table
    t.write(_rows(spark, range(8), "a"), partition_by=["category"])
    t.write(_rows(spark, range(8, 12), "b"), partition_by=["category"])
    t.delete_where(spark, "event_id < 3", filters=[("category", "=", "a")])
    assert {r.event_id for r in t.read(spark).collect()} == set(range(3, 12))
    for fp in _data_files(t):
        assert "p_1" in spark.read.parquet(fp).columns


def test_delete_where_dv_on_mapped_table(spark, mapped_table):
    """DV delete on a mapped table: the logical-name predicate selects
    rows whose PHYSICAL row ordinals land in the bitmap — re-read and
    cdc() must both hide them."""
    t = mapped_table
    t.write(_rows(spark, range(10)).coalesce(1), partition_by=["category"])
    v = t.delete_where_dv(spark, "event_id IN (0, 4, 9)")
    assert {r.event_id for r in t.read(spark).collect()} == {1, 2, 3, 5, 6, 7, 8}
    # data file NOT rewritten (merge-on-read): same physical file re-added
    snap = t.snapshot()
    (only,) = snap.files
    assert snap.adds[only]["deletionVector"]["cardinality"] == 3
    # re-delete unions into the existing DV
    t.delete_where_dv(spark, "event_id = 7")
    assert {r.event_id for r in t.read(spark).collect()} == {1, 2, 3, 5, 6, 8}
    # cdc over the DV commit: pre-DV remove re-emits all 10 rows as 'r',
    # the DV-carrying re-add emits the 7 live rows as 'c' — under
    # LOGICAL column names
    ch = t.cdc(spark, start_version=v)
    assert "event_id" in ch.columns
    import pyspark.sql.functions as F

    by = {
        r["op"]: r["cnt"]
        for r in ch.filter(F.col("_commit_version") == v)
        .groupBy("op").agg(F.count("*").alias("cnt")).collect()
    }
    assert by == {"r": 10, "c": 7}


def test_schema_evolution_assigns_physical_names(spark, mapped_table):
    """Appending a new column to a mapped table assigns it a col-<uuid>
    physicalName and bumps delta.columnMapping.maxColumnId; old rows
    null-fill, and the new column round-trips under its logical name."""
    t = mapped_table
    t.write(_rows(spark, range(3)), partition_by=["category"])
    widened = spark.createDataFrame(
        [(3, "a", 3.0, "x"), (4, "a", 4.0, "y")],
        "event_id long, category string, value double, extra string",
    )
    t.write(widened, partition_by=["category"])
    snap = t.snapshot()
    fields = {f["name"]: f for f in json.loads(snap.schema_string)["fields"]}
    meta = fields["extra"]["metadata"]
    assert meta["delta.columnMapping.physicalName"].startswith("col-")
    assert int(meta["delta.columnMapping.id"]) >= 1
    assert int(snap.configuration["delta.columnMapping.maxColumnId"]) == int(
        meta["delta.columnMapping.id"]
    )
    # original columns keep their original physical names
    assert fields["event_id"]["metadata"]["delta.columnMapping.physicalName"] == "p_1"
    got = {r.event_id: r.extra for r in t.read(spark).collect()}
    assert got == {0: None, 1: None, 2: None, 3: "x", 4: "y"}
    # the staged parquet never contains the LOGICAL name
    for fp in _data_files(t):
        cols = set(spark.read.parquet(fp).columns)
        assert "extra" not in cols and "event_id" not in cols


def test_enable_column_mapping_upgrade(spark, tmp_path):
    """Enabling name-mode mapping on an existing table keeps every
    existing column's name as its physicalName (no file rewrite), takes
    the table-features protocol WITHOUT dropping prior features, and
    later appends of new columns get col-<uuid> names."""
    from pulsar_io_delta_spark.sources.delta_log import DeltaTable

    t = DeltaTable(str(tmp_path / "up"))
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(6)], "event_id long, value double"
    )
    t.write(df, partition_by=[])
    v = t.enable_column_mapping()
    assert t.enable_column_mapping() == v  # idempotent
    snap = t.snapshot()
    assert snap.configuration["delta.columnMapping.mode"] == "name"
    assert snap.configuration["delta.columnMapping.maxColumnId"] == "2"
    p = snap.protocol
    assert p["minReaderVersion"] == 3 and "columnMapping" in p["readerFeatures"]
    # implicit legacy writer features enumerated on upgrade, not dropped
    assert {"appendOnly", "invariants"} <= set(p["writerFeatures"])
    # pre-upgrade files stay readable (physicalName == logical name)
    assert {r.event_id for r in t.read(spark).collect()} == set(range(6))
    # post-upgrade evolution takes the col-uuid path
    t.write(spark.createDataFrame(
        [(6, 6.0, "z")], "event_id long, value double, tag string"
    ))
    snap = t.snapshot()
    tagmeta = {
        f["name"]: f for f in json.loads(snap.schema_string)["fields"]
    }["tag"]["metadata"]
    assert tagmeta["delta.columnMapping.physicalName"].startswith("col-")
    assert snap.configuration["delta.columnMapping.maxColumnId"] == "3"
    got = {r.event_id: r.tag for r in t.read(spark).collect()}
    assert got[6] == "z" and got[0] is None
    # DV delete still works across the mapped/unmapped file mix
    t.delete_where_dv(spark, "event_id IN (1, 6)")
    assert {r.event_id for r in t.read(spark).collect()} == {0, 2, 3, 4, 5}


ID_SCHEMA = json.dumps(
    {
        "type": "struct",
        "fields": [
            {"name": "event_id", "type": "long", "nullable": True,
             "metadata": {"delta.columnMapping.id": 1,
                          "delta.columnMapping.physicalName": "p_1"}},
            {"name": "value", "type": "double", "nullable": True,
             "metadata": {"delta.columnMapping.id": 2,
                          "delta.columnMapping.physicalName": "p_2"}},
        ],
    }
)


def _write_id_mode_table(spark, root, file_field_names):
    """Handwrite an id-mode table whose data file stores
    ``file_field_names`` with parquet field ids 1/2 (what an
    id-preserving foreign engine produces)."""
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    w_schema = StructType([
        StructField(file_field_names[0], LongType(), True, {"parquet.field.id": 1}),
        StructField(file_field_names[1], DoubleType(), True, {"parquet.field.id": 2}),
    ])
    spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
    df = spark.createDataFrame([(i, float(i)) for i in range(6)], schema=w_schema)
    df.coalesce(1).write.parquet(os.path.join(root, "d"))
    (pq,) = [f for f in os.listdir(os.path.join(root, "d")) if f.endswith(".parquet")]
    actions = [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {"metaData": {"id": "idm", "schemaString": ID_SCHEMA,
                      "partitionColumns": [],
                      "configuration": {"delta.columnMapping.mode": "id"}}},
        {"add": {"path": f"d/{pq}", "partitionValues": {}, "size": 1,
                 "modificationTime": 1, "dataChange": True}},
    ]
    os.makedirs(os.path.join(root, "_delta_log"))
    with open(os.path.join(root, "_delta_log", f"{0:020d}.json"), "w") as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")
    return DeltaTable(root)


def test_id_mode_read_matches_by_field_id(spark, tmp_path):
    """id-mode mapping (round 8): a file written by an id-preserving
    FOREIGN engine — column names that match NEITHER logical nor
    physical names, only parquet field ids — reads under logical names."""
    t = _write_id_mode_table(spark, str(tmp_path / "idm"),
                             ("foreign_x", "foreign_y"))
    out = t.read(spark)
    assert set(out.columns) == {"event_id", "value"}
    assert {(r.event_id, r.value) for r in out.collect()} == {
        (i, float(i)) for i in range(6)
    }


def test_id_mode_read_delta_written_physical_names(spark, tmp_path):
    """The same id-mode table with a Delta-writer-style file (physical
    p_1/p_2 names + ids) reads identically — name OR id matching."""
    t = _write_id_mode_table(spark, str(tmp_path / "idm2"), ("p_1", "p_2"))
    assert {(r.event_id, r.value) for r in t.read(spark).collect()} == {
        (i, float(i)) for i in range(6)
    }


@pytest.mark.parametrize("fs_kind", ["local", "memory"])
def test_id_mode_write_read_round_trip(spark, tmp_path, fs_kind):
    """Round 9 (VERDICT r8 #4): writes to id-mode tables. The table's
    existing FOREIGN file stores column names that match NEITHER
    logical nor physical names (id-matching only); our append stages
    physical names WITH stamped parquet field ids — both files resolve
    by id in one scan, on both FS backends."""
    import pyarrow.parquet as pq_mod

    from pulsar_io_delta_spark.sources.fs import InMemoryFileSystem

    root = str(tmp_path / "idm3")
    t = _write_id_mode_table(spark, root, ("alien_a", "alien_b"))
    v = t.write(spark.createDataFrame(
        [(9, 9.0), (10, 10.5)], "event_id long, value double"
    ).coalesce(1))
    assert v == 1
    if fs_kind == "memory":
        # data staging is a local/shared-FS concern; the object-store
        # backend takes CONTROL-plane commits — mirror the log into the
        # shim and resolve the id-mode table through it
        mem = InMemoryFileSystem()
        mem.makedirs(os.path.join(root, "_delta_log"))
        for fn in os.listdir(os.path.join(root, "_delta_log")):
            with open(os.path.join(root, "_delta_log", fn)) as f:
                mem.write_text(os.path.join(root, "_delta_log", fn), f.read())
        t = DeltaTable(root, fs=mem)
    got = {(r.event_id, r.value) for r in t.read(spark).collect()}
    assert got == {(i, float(i)) for i in range(6)} | {(9, 9.0), (10, 10.5)}
    # the staged file carries PHYSICAL names AND parquet field ids
    new_rel = [p for p in t.snapshot().files if not p.startswith("d/")]
    assert len(new_rel) == 1
    sch = pq_mod.ParquetFile(os.path.join(root, new_rel[0])).schema_arrow
    names = {f.name for f in sch}
    assert names == {"p_1", "p_2"}
    ids = {
        f.name: f.metadata.get(b"PARQUET:field_id") for f in sch
    }
    assert ids == {"p_1": b"1", "p_2": b"2"}
    # a third engine matching PURELY by id (different names again)
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    alien = StructType([
        StructField("x_1", LongType(), True, {"parquet.field.id": 1}),
        StructField("x_2", DoubleType(), True, {"parquet.field.id": 2}),
    ])
    by_id = spark.read.schema(alien).parquet(os.path.join(root, new_rel[0]))
    assert {(r.x_1, r.x_2) for r in by_id.collect()} == {(9, 9.0), (10, 10.5)}


def test_id_mode_nested_writes_still_rejected(spark, tmp_path):
    """id-mode tables with mapped NESTED struct columns stay read-only
    (the staging rename cannot reach subfields) — loud, not silent."""
    root = str(tmp_path / "idn")
    nested_schema = json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": "event_id", "type": "long", "nullable": True,
                 "metadata": {"delta.columnMapping.id": 1,
                              "delta.columnMapping.physicalName": "p_1"}},
                {"name": "info", "nullable": True,
                 "metadata": {"delta.columnMapping.id": 2,
                              "delta.columnMapping.physicalName": "p_2"},
                 "type": {"type": "struct", "fields": [
                     {"name": "a", "type": "long", "nullable": True,
                      "metadata": {"delta.columnMapping.id": 3,
                                   "delta.columnMapping.physicalName": "p_3"}},
                 ]}},
            ],
        }
    )
    os.makedirs(os.path.join(root, "_delta_log"))
    actions = [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {"metaData": {"id": "idn", "schemaString": nested_schema,
                      "partitionColumns": [],
                      "configuration": {"delta.columnMapping.mode": "id"}}},
    ]
    with open(os.path.join(root, "_delta_log", f"{0:020d}.json"), "w") as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")
    t = DeltaTable(root)
    with pytest.raises(DeltaProtocolError, match="nested"):
        t.write(spark.createDataFrame([(1, (2,))], "event_id long, info struct<a:long>"))


def test_nested_struct_mapping_read(spark, tmp_path):
    """Name-mode mapping over a STRUCT column (round 8): physical names
    at BOTH nesting levels in the file, logical names out, NULL structs
    preserved (not turned into structs of nulls). Writes refuse."""
    from pyspark.sql.types import (
        DoubleType, LongType, StringType, StructField, StructType,
    )

    root = str(tmp_path / "nested")
    w_schema = StructType([
        StructField("p_id", LongType(), True),
        StructField("p_info", StructType([
            StructField("p_name", StringType(), True),
            StructField("p_score", DoubleType(), True),
        ]), True),
    ])
    rows = [(0, ("alpha", 1.5)), (1, None), (2, ("gamma", None))]
    spark.createDataFrame(rows, schema=w_schema).coalesce(1).write.parquet(
        os.path.join(root, "d")
    )
    (pq,) = [f for f in os.listdir(os.path.join(root, "d")) if f.endswith(".parquet")]
    schema = json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": "event_id", "type": "long", "nullable": True,
                 "metadata": {"delta.columnMapping.physicalName": "p_id"}},
                {"name": "info", "nullable": True,
                 "metadata": {"delta.columnMapping.physicalName": "p_info"},
                 "type": {"type": "struct", "fields": [
                     {"name": "name", "type": "string", "nullable": True,
                      "metadata": {"delta.columnMapping.physicalName": "p_name"}},
                     {"name": "score", "type": "double", "nullable": True,
                      "metadata": {"delta.columnMapping.physicalName": "p_score"}},
                 ]}},
            ],
        }
    )
    actions = [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {"metaData": {"id": "nested", "schemaString": schema,
                      "partitionColumns": [],
                      "configuration": {"delta.columnMapping.mode": "name"}}},
        {"add": {"path": f"d/{pq}", "partitionValues": {}, "size": 1,
                 "modificationTime": 1, "dataChange": True}},
    ]
    os.makedirs(os.path.join(root, "_delta_log"))
    with open(os.path.join(root, "_delta_log", f"{0:020d}.json"), "w") as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")
    t = DeltaTable(root)
    out = t.read(spark)
    assert set(out.columns) == {"event_id", "info"}
    got = {r.event_id: r.info for r in out.collect()}
    assert got[0].name == "alpha" and got[0].score == 1.5
    assert got[1] is None                     # null struct preserved
    assert got[2].name == "gamma" and got[2].score is None
    # logical subfield names, queryable
    assert {r.n for r in out.selectExpr("info.name AS n").collect()} == {
        "alpha", "gamma", None
    }
    # writes refuse loudly
    with pytest.raises(DeltaProtocolError, match="nested struct"):
        t.write(out.limit(1))


def test_array_and_map_of_struct_mapping_read(spark, tmp_path):
    """Round 9 (VERDICT r8 #3): name-mode mapping through structs
    nested INSIDE arrays and maps — the UniForm / Iceberg-converted
    shape. Physical names at every level in the file; logical names
    out via higher-order transform/transform_values rebuilds; null
    elements, null structs, and empty containers preserved."""
    from pyspark.sql.types import (
        ArrayType, DoubleType, LongType, MapType, StringType, StructField,
        StructType,
    )

    root = str(tmp_path / "aos")
    elem = StructType([
        StructField("p_tag", StringType(), True),
        StructField("p_w", DoubleType(), True),
    ])
    w_schema = StructType([
        StructField("p_id", LongType(), True),
        StructField("p_xs", ArrayType(elem, True), True),
        StructField("p_m", MapType(StringType(), elem, True), True),
    ])
    rows = [
        (0, [("a", 1.0), None, ("b", None)], {"k": ("v", 2.0)}),
        (1, None, None),
        (2, [], {}),
    ]
    spark.createDataFrame(rows, schema=w_schema).coalesce(1).write.parquet(
        os.path.join(root, "d")
    )
    (pq,) = [f for f in os.listdir(os.path.join(root, "d")) if f.endswith(".parquet")]
    selem = {"type": "struct", "fields": [
        {"name": "tag", "type": "string", "nullable": True,
         "metadata": {"delta.columnMapping.physicalName": "p_tag"}},
        {"name": "weight", "type": "double", "nullable": True,
         "metadata": {"delta.columnMapping.physicalName": "p_w"}},
    ]}
    schema = json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": "event_id", "type": "long", "nullable": True,
                 "metadata": {"delta.columnMapping.physicalName": "p_id"}},
                {"name": "xs", "nullable": True,
                 "metadata": {"delta.columnMapping.physicalName": "p_xs"},
                 "type": {"type": "array", "containsNull": True,
                          "elementType": selem}},
                {"name": "m", "nullable": True,
                 "metadata": {"delta.columnMapping.physicalName": "p_m"},
                 "type": {"type": "map", "keyType": "string",
                          "valueType": selem, "valueContainsNull": True}},
            ],
        }
    )
    actions = [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {"metaData": {"id": "aos", "schemaString": schema,
                      "partitionColumns": [],
                      "configuration": {"delta.columnMapping.mode": "name"}}},
        {"add": {"path": f"d/{pq}", "partitionValues": {}, "size": 1,
                 "modificationTime": 1, "dataChange": True}},
    ]
    os.makedirs(os.path.join(root, "_delta_log"))
    with open(os.path.join(root, "_delta_log", f"{0:020d}.json"), "w") as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")
    t = DeltaTable(root)
    out = t.read(spark)
    assert set(out.columns) == {"event_id", "xs", "m"}
    got = {r.event_id: r for r in out.collect()}
    assert got[0].xs[0].tag == "a" and got[0].xs[0].weight == 1.0
    assert got[0].xs[1] is None                 # null ELEMENT preserved
    assert got[0].xs[2].tag == "b" and got[0].xs[2].weight is None
    assert got[0].m["k"].tag == "v" and got[0].m["k"].weight == 2.0
    assert got[1].xs is None and got[1].m is None   # null containers
    assert got[2].xs == [] and got[2].m == {}       # empty containers
    # logical names usable in downstream exprs (lateral explode)
    tags = {
        r.tag
        for r in out.selectExpr("inline_outer(xs)").select("tag").collect()
    }
    assert tags == {"a", "b", None}
    # no python eval in the rebuilt plan: transform is codegen-side
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_id_mode_file_without_ids_fails_loudly(spark, tmp_path):
    """A spec-violating id-mode file that carries NO parquet field ids
    must FAIL the read (Spark's missing-field-ids error) — never
    silently null-fill columns."""
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    root = str(tmp_path / "noids")
    w_schema = StructType([
        StructField("p_1", LongType(), True),          # no field ids
        StructField("p_2", DoubleType(), True),
    ])
    spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "false")
    try:
        spark.createDataFrame(
            [(i, float(i)) for i in range(3)], schema=w_schema
        ).coalesce(1).write.parquet(os.path.join(root, "d"))
    finally:
        spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
    (pq,) = [f for f in os.listdir(os.path.join(root, "d")) if f.endswith(".parquet")]
    actions = [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {"metaData": {"id": "noids", "schemaString": ID_SCHEMA,
                      "partitionColumns": [],
                      "configuration": {"delta.columnMapping.mode": "id"}}},
        {"add": {"path": f"d/{pq}", "partitionValues": {}, "size": 1,
                 "modificationTime": 1, "dataChange": True}},
    ]
    os.makedirs(os.path.join(root, "_delta_log"))
    with open(os.path.join(root, "_delta_log", f"{0:020d}.json"), "w") as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")
    with pytest.raises(Exception, match="field Id|FAILED_READ"):
        DeltaTable(root).read(spark).collect()
