"""Training-data pipeline operators: deterministic sampling, PII
redaction, repetition metrics, stratified capping, Pulsar wire frame."""

import pyspark.sql.functions as F

from pulsar_io_delta_spark.functions.murmur3 import partition_id_for
from pulsar_io_delta_spark.operators import pipeline as pl


def test_hash_sample_is_partitioning_independent(spark):
    df = spark.range(10_000).withColumnRenamed("id", "k")
    pred = pl.hash_sample_predicate(F.col("k"), 0.2)
    a = {r.k for r in df.where(pred).collect()}
    b = {r.k for r in df.repartition(17).where(pred).collect()}
    assert a == b  # df.sample() would fail this
    assert 0.15 < len(a) / 10_000 < 0.25


def test_hash_sample_xx_fraction(spark):
    df = spark.range(10_000).withColumnRenamed("id", "k")
    kept = df.where(pl.hash_sample_xx(F.col("k"), 0.3)).count()
    assert 0.25 < kept / 10_000 < 0.35


def test_redact_pii_cases(spark):
    rows = [
        ("write to a.b+c@mail.example.org today", "write to <EMAIL> today"),
        ("call +1 (555) 123-4567 now", "call <PHONE> now"),
        ("no pii here", "no pii here"),
        ("x@y.io and 555 123 4567", "<EMAIL> and <PHONE>"),
    ]
    df = spark.createDataFrame([(t,) for t, _e in rows], "t string")
    got = [r.m for r in df.select(pl.redact_pii(F.col("t")).alias("m")).collect()]
    assert got == [e for _t, e in rows]


def test_word_bigram_metrics(spark):
    df = spark.createDataFrame(
        [
            (1, "a b a b a b"),       # bigrams: ab,ba,ab,ba,ab → 5 total, 2 distinct
            (2, "w x y z"),           # 3 total, 3 distinct
            (3, "solo"),              # <2 tokens → excluded
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in pl.word_bigram_metrics(df, "doc_id", "text").collect()}
    assert set(out) == {1, 2}
    assert (out[1].total_bigrams, out[1].distinct_bigrams) == (5, 2)
    assert out[1].dup_frac == 0.6 and out[1].top_frac == 0.6  # 'a b' ×3
    assert (out[2].total_bigrams, out[2].distinct_bigrams) == (3, 3)
    assert out[2].dup_frac == 0.0


def test_stratified_cap_bounds_each_stratum(spark):
    df = spark.createDataFrame(
        [(s, i) for s in ("a", "b") for i in range(10)], "src string, k long"
    )
    out = pl.stratified_cap(df, "src", "k", 3)
    rows = out.collect()
    assert len(rows) == 6
    assert {(r.src, r.k) for r in rows} == {(s, i) for s in ("a", "b") for i in range(3)}


def test_pulsar_wire_partition_parity(spark):
    df = spark.createDataFrame([("k1", 1), ("k2", 2), ("", 3)], "key string, v long")
    wire = pl.to_pulsar_wire(df, "key", F.col("v").cast("string"), num_partitions=16)
    rows = wire.collect()
    for r in rows:
        assert r.partition_id == partition_id_for(r.key, 16)
        assert isinstance(r.value, (bytes, bytearray))
