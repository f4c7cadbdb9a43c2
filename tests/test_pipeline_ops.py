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


def test_pack_sequences_invariants(spark):
    # 40 docs with varied token counts, including several > budget
    # (straddle many packs) and one zero-token doc (excluded).
    rows = [(i, (i * 37) % 300) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, n_tok long")
    out = pl.pack_sequences(
        df, "doc_id", F.col("n_tok"), budget=100, shards=4
    ).cache()

    # Fragments reassemble each doc exactly.
    per_doc = {
        r.doc_id: r.s
        for r in out.groupBy("doc_id").agg(F.sum("frag_tokens").alias("s")).collect()
    }
    expected = {i: n for i, n in rows if n > 0}
    assert per_doc == expected

    # No pack holds more than budget tokens; offsets stay in range.
    per_pack = out.groupBy("shard", "pack_id").agg(
        F.sum("frag_tokens").alias("s"), F.max(F.col("pack_offset") + F.col("frag_tokens")).alias("hi")
    )
    bad = per_pack.where((F.col("s") > 100) | (F.col("hi") > 100)).count()
    assert bad == 0

    # Within a shard, packs are dense: every pack id 0..max exists.
    for r in (
        out.groupBy("shard")
        .agg(F.countDistinct("pack_id").alias("n"), F.max("pack_id").alias("m"))
        .collect()
    ):
        assert r.n == r.m + 1


def test_quality_filter_rules(spark):
    df = spark.createDataFrame(
        [
            (1, "short text"),  # < 30 tokens
            (2, " ".join(f"w{i}" for i in range(40))),  # distinct, alpha-poor? w0..w39 has digits
            # long words keep alpha_ratio high; 5 distinct / 40 total
            (3, " ".join("university researchers examined phenomena thoroughly".split() * 8)),
            (4, " ".join(f"word{chr(97 + i % 26)}x{chr(97 + (i * 7) % 26)}" for i in range(50))),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.fail_reason for r in pl.quality_filter(df).collect()}
    assert got[1] == "too_short"
    assert got[3] == "repetitive"


def test_split_assign_fractions_and_determinism(spark):
    df = spark.createDataFrame([(i,) for i in range(5000)], "doc_id long")
    out = df.select(
        "doc_id",
        pl.split_assign(F.col("doc_id"), {"train": 0.9, "val": 0.05, "test": 0.05}).alias("s"),
    )
    counts = {r.s: r.c for r in out.groupBy("s").agg(F.count("*").alias("c")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert abs(counts["train"] / 5000 - 0.9) < 0.03
    # pure function of id: repartitioning does not move anyone
    moved = (
        out.withColumnRenamed("s", "s1")
        .join(df.repartition(17).select("doc_id", pl.split_assign(
            F.col("doc_id"), {"train": 0.9, "val": 0.05, "test": 0.05}).alias("s2")), "doc_id")
        .where(F.col("s1") != F.col("s2"))
        .count()
    )
    assert moved == 0


def test_decontaminate_planted_overlap(spark):
    bench_text = " ".join(f"tok{i}alpha tok{i}beta" for i in range(20))
    clean_text = " ".join(f"other{i}gamma other{i}delta" for i in range(20))
    half = " ".join(bench_text.split()[:20] + clean_text.split()[:20])
    df = spark.createDataFrame(
        [(1, bench_text), (2, clean_text), (3, half)], "doc_id long, text string"
    )
    bench = df.where(F.col("doc_id") == 1)
    got = {r.doc_id: r for r in pl.decontaminate_overlap(df, bench, "doc_id").collect()}
    assert got[1].overlap_frac == 1.0       # benchmark self-match
    assert got[2].overlap_frac == 0.0       # disjoint vocab
    assert 0.0 < got[3].overlap_frac < 1.0  # half-contaminated
