"""Fixture drift tripwires (round-6, VERDICT r5 items #5/#7).

The driver REGENERATES /root/testdata between code freeze and scoring;
round 4 lost 16 queries to a silent ts-encoding flip. These tests make
any such drift fail loudly and NAME the table/column:

- per-table post-load schema contract: ``tables.table`` must hand every
  query the exact schema the 132 registered queries were written
  against (event-time columns normalized to TIMESTAMP whatever the
  physical encoding). A deliberate driver change (e.g. a widened key)
  should be adopted by updating EXPECTED here — consciously, not by
  silent coercion downstream.
- value-shape probes for the contracts a schema can't express:
  events.props is a JSON object string (q_json_funcs parses it),
  embeddings.embedding is 64-dimensional (the LSH hyperplanes and the
  IVF centroids are built for dim=64).
- bench-headline build guard: every HEADLINE query must at least
  construct its DataFrame against the fixture (analysis pass), so a
  loader-level AnalysisException fails pytest instead of surfacing as
  a bench error entry with no numbers (the round-4 failure mode).
"""

import pytest

from pulsar_io_delta_spark.tables import TABLE_NAMES, table

EXPECTED = {
    "region": "struct<r_regionkey:int,r_name:string>",
    "nation": "struct<n_nationkey:int,n_name:string,n_regionkey:int>",
    "customer": (
        "struct<c_custkey:bigint,c_name:string,c_nationkey:int,"
        "c_acctbal:double,c_mktsegment:string>"
    ),
    "supplier": "struct<s_suppkey:bigint,s_name:string,s_nationkey:int,s_acctbal:double>",
    "part": (
        "struct<p_partkey:bigint,p_name:string,p_brand:string,p_type:string,"
        "p_size:int,p_retailprice:double>"
    ),
    "orders": (
        "struct<o_orderkey:bigint,o_custkey:bigint,o_orderstatus:string,"
        "o_totalprice:double,o_orderdate:timestamp,o_orderpriority:string>"
    ),
    "lineitem": (
        "struct<l_orderkey:bigint,l_partkey:bigint,l_suppkey:bigint,"
        "l_linenumber:int,l_quantity:double,l_extendedprice:double,"
        "l_discount:double,l_tax:double,l_returnflag:string,"
        "l_linestatus:string,l_shipdate:timestamp>"
    ),
    "events": (
        "struct<event_id:bigint,ts:timestamp,user_id:bigint,"
        "event_type:string,value:double,props:string>"
    ),
    "documents": "struct<doc_id:bigint,text:string,lang:string,source:string,n_chars:bigint>",
    "embeddings": "struct<vec_id:bigint,embedding:array<float>,label:int>",
}


@pytest.mark.parametrize("name", list(TABLE_NAMES))
def test_fixture_schema_contract(spark, sf_dir, name):
    got = table(spark, sf_dir, name).schema.simpleString()
    assert got == EXPECTED[name], (
        f"fixture table {name!r} drifted: post-load schema\n  {got}\n"
        f"!= contract\n  {EXPECTED[name]}\n"
        "If the driver changed the fixture deliberately, update EXPECTED "
        "and audit the queries touching the changed columns."
    )


def test_events_props_is_json_object(spark, sf_dir):
    import pyspark.sql.functions as F

    e = table(spark, sf_dir, "events")
    row = e.where(F.col("props").isNotNull()).select(
        F.get_json_object("props", "$").alias("obj"), "props"
    ).first()
    assert row is not None and row.obj is not None, (
        f"events.props no longer parses as JSON: {row and row.props!r}"
    )


def test_embeddings_are_64_dimensional(spark, sf_dir):
    import pyspark.sql.functions as F

    e = table(spark, sf_dir, "embeddings")
    dims = e.select(F.size("embedding").alias("d")).distinct().collect()
    assert [r.d for r in dims] == [64], (
        f"embedding dim drifted: {[r.d for r in dims]} != [64] — the LSH "
        "hyperplanes (sim.hyperplanes(64, 8)) and IVF centroids assume 64"
    )


def test_bench_headline_queries_build(spark, sf_dir):
    import sys

    sys.path.insert(0, "/root/repo")
    import bench
    from pulsar_io_delta_spark.registry import all_queries

    specs = all_queries()
    missing = [n for n in bench.HEADLINE if n not in specs]
    assert not missing, f"HEADLINE names not registered: {missing}"
    broken = {}
    for name in bench.HEADLINE:
        try:
            df = specs[name].fn(spark, sf_dir)
            _ = df.schema  # forces the analysis pass
        except Exception as exc:  # noqa: BLE001 — collecting per-query
            broken[name] = f"{type(exc).__name__}: {exc}"[:200]
    assert not broken, f"headline queries fail to build: {broken}"


def test_documents_text_ascii_and_length(spark, sf_dir):
    """q_multimodal_real_decode and q_source_binary frame the first 36
    chars of text as a 6×6 PGM and recover the pixel sum from
    codepoints — which equals the byte sum only while text is ASCII and
    ≥36 chars. A fixture regeneration that introduces non-ASCII or
    short docs must fail HERE with the table named, not as an oracle
    hash mismatch."""
    import pyspark.sql.functions as F

    d = table(spark, sf_dir, "documents")
    bad = d.where(
        (F.length("text") < 36) | F.col("text").rlike("[^\\x20-\\x7e]")
    ).count()
    assert bad == 0, (
        f"{bad} documents are <36 chars or non-printable-ASCII — audit "
        "q_multimodal_real_decode / q_source_binary framing"
    )


def test_documents_source_format(spark, sf_dir):
    """q_mixture_sample / q_curation_pipeline key their per-domain
    thresholds on the numeric suffix of `source` ('srcN'). A fixture
    regeneration that changes the naming would make DuckDB's
    CAST(regexp_extract(...) AS BIGINT) ERROR (Spark nulls instead) —
    fail HERE with the table named, not as an oracle exception."""
    import pyspark.sql.functions as F

    d = table(spark, sf_dir, "documents")
    bad = d.where(~F.col("source").rlike(r"^src[0-9]+$")).count()
    assert bad == 0, (
        f"{bad} documents.source values do not match '^src[0-9]+$' — "
        "audit the mixture/shard/curation threshold keying"
    )


def test_fixture_regeneration_invalidates_derived_caches(spark, tmp_path):
    """The round-4 failure class, defended end-to-end: q_source_logs
    caches its rendered text lines per fixture; when the driver
    REGENERATES events.parquet at the same path, the identity key
    (mtime+size) must invalidate the cache and the query must reflect
    the new corpus — a stale cache would return generation-1 values
    and silently diverge from the oracle."""
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from pulsar_io_delta_spark.queries.pipeline3 import q_source_logs

    sf = tmp_path / "sf"
    sf.mkdir()

    def write_events(values):
        tbl = pa.table(
            {
                "event_id": pa.array(range(len(values)), pa.int64()),
                "ts": pa.array(
                    [1704067200000000 + i * 1_000_000 for i in range(len(values))],
                    pa.timestamp("us"),
                ),
                "user_id": pa.array([i % 3 for i in range(len(values))], pa.int64()),
                "event_type": pa.array(["view"] * len(values)),
                "value": pa.array(values, pa.float64()),
                "props": pa.array(['{"k": 1}'] * len(values)),
            }
        )
        pq.write_table(tbl, str(sf / "events.parquet"))

    write_events([1.25, 2.5, 3.75])
    got1 = {r.event_id: r.cents for r in q_source_logs(spark, str(sf)).collect()}
    assert got1 == {0: 125, 1: 250, 2: 375}

    time.sleep(0.01)  # ensure a distinct mtime even on coarse clocks
    write_events([9.99, 8.88, 7.77, 6.66])  # regenerated: new values AND size
    got2 = {r.event_id: r.cents for r in q_source_logs(spark, str(sf)).collect()}
    assert got2 == {0: 999, 1: 888, 2: 777, 3: 666}, (
        "stale cache served generation-1 lines after fixture regeneration"
    )
