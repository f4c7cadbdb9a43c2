"""Training-data pipeline query surface: deterministic sampling, PII
redaction, repetition quality metrics, domain capping, and the Pulsar
wire-format boundary.

Registered after the core inventory (these are additive round-2
operators; the driver's correctness window rotates over rounds).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pulsar_io_delta_spark.operators import pipeline as pl
from pulsar_io_delta_spark.registry import register
from pulsar_io_delta_spark.tables import table

SAMPLE_FRACTION = 0.1
_THRESHOLD = int(pl.M32 * SAMPLE_FRACTION)


@register(
    "q_sample_hash",
    oracle=f"""
SELECT doc_id, source, n_chars
FROM documents
WHERE (doc_id * {pl.KNUTH32}) % {pl.M32} < {_THRESHOLD}
""",
)
def q_sample_hash(spark, sf_dir):
    """10% deterministic sample: the keep/drop decision is a pure
    function of doc_id (stable across runs, partitionings, engines),
    unlike seeded per-partition df.sample()."""
    d = table(spark, sf_dir, "documents")
    return d.where(pl.hash_sample_predicate(F.col("doc_id"), SAMPLE_FRACTION)).select(
        "doc_id", "source", "n_chars"
    )


@register(
    "q_text_redact",
    oracle="""
SELECT doc_id,
       regexp_replace(
         regexp_replace(
           concat('reach user', CAST(doc_id AS VARCHAR),
                  '@example.com or +12 3456 7890 ', substring(text, 1, 40)),
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
         '\\+?[0-9][0-9()\\- ]{6,}[0-9]', '<PHONE>', 'g') AS redacted
FROM documents
""",
)
def q_text_redact(spark, sf_dir):
    """PII masking over a synthesized contact line (the corpus itself
    has no emails/phones, so the query plants one per row and asserts
    the masked output byte-for-byte)."""
    d = table(spark, sf_dir, "documents")
    synth = F.concat(
        F.lit("reach user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or +12 3456 7890 "),
        F.substring("text", 1, 40),
    )
    return d.select("doc_id", pl.redact_pii(synth).alias("redacted"))


@register(
    "q_repetition_metrics",
    oracle="""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS t
  FROM documents
), bg AS (
  SELECT doc_id, t[i] || ' ' || t[i + 1] AS bigram
  FROM toks JOIN range(1, 8192) r(i) ON i <= len(t) - 1
  WHERE len(t) >= 2
), cnt AS (
  SELECT doc_id, bigram, count(*) AS c FROM bg GROUP BY doc_id, bigram
)
SELECT doc_id,
       CAST(sum(c) AS BIGINT) AS total_bigrams,
       CAST(count(*) AS BIGINT) AS distinct_bigrams,
       round(1.0 - count(*) * 1.0 / sum(c), 4) AS dup_frac,
       round(max(c) * 1.0 / sum(c), 4) AS top_frac
FROM cnt GROUP BY doc_id
""",
)
def q_repetition_metrics(spark, sf_dir):
    """Gopher-style repetition quality signals: duplicate-bigram and
    top-bigram fractions per document."""
    return pl.word_bigram_metrics(table(spark, sf_dir, "documents"), "doc_id", "text")


@register(
    "q_domain_cap",
    oracle="""
SELECT source, doc_id, rn FROM (
  SELECT source, doc_id,
         CAST(row_number() OVER (PARTITION BY source ORDER BY doc_id) AS BIGINT) AS rn
  FROM documents
) WHERE rn <= 50
""",
)
def q_domain_cap(spark, sf_dir):
    """Data-mixing cap: at most 50 docs per source, deterministic
    total order inside each stratum."""
    capped = pl.stratified_cap(
        table(spark, sf_dir, "documents"), "source", "doc_id", 50
    )
    return capped.select("source", "doc_id", "rn")


@register("q_cdc_schema_evolution", oracle=None)  # streaming restart loop — not SQL
def q_cdc_schema_evolution(spark, sf_dir):
    """Epoch-bounded CDC streaming across an op='m' boundary: three
    commits (the third adds a column), drained by the restart loop with
    each epoch's schema; returns every delivered row. Deterministic
    rows-only contract: 30 rows, ids 0..29, score non-null iff id>=20."""
    import tempfile

    from pulsar_io_delta_spark.sources.delta_log import DeltaTable
    from pulsar_io_delta_spark.streaming.runner import run_cdc_with_schema_evolution

    base = tempfile.mkdtemp(prefix="pids_evo_")
    path, ck = base + "/tbl", base + "/ck"
    t = DeltaTable(path)
    t.write(spark.range(0, 10).select(F.col("id").alias("doc_id")))
    t.write(spark.range(10, 20).select(F.col("id").alias("doc_id")))
    t.write(
        spark.range(20, 30).select(
            F.col("id").alias("doc_id"), (F.col("id") * 1.5).alias("score")
        )
    )
    rows: list[tuple] = []

    def sink(df, _batch_id):
        score = F.col("score") if "score" in df.columns else F.lit(None).cast("double")
        for r in df.select("doc_id", score.alias("score"), "_commit_version").collect():
            rows.append((r.doc_id, r.score, r._commit_version))

    run_cdc_with_schema_evolution(spark, path, ck, sink)
    return spark.createDataFrame(
        rows, "doc_id long, score double, _commit_version long"
    )


@register(
    "q_merge_upsert",
    oracle="""
SELECT doc_id, source, n_chars FROM documents WHERE doc_id < 100
UNION ALL
SELECT doc_id, source, CAST(n_chars * 2 AS BIGINT) AS n_chars
FROM documents WHERE doc_id BETWEEN 100 AND 249
""",
)
def q_merge_upsert(spark, sf_dir):
    """MERGE semantics end-to-end: docs <200 become a Delta table, a
    source of (100..249, doubled n_chars) upserts into it — 100..199
    update in place, 200..249 insert; <100 pass through untouched."""
    import tempfile

    from pulsar_io_delta_spark.sources.delta_log import DeltaTable

    d = table(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    path = tempfile.mkdtemp(prefix="pids_merge_") + "/tbl"
    t = DeltaTable(path)
    t.write(d.where(F.col("doc_id") < 200))
    src = d.where(F.col("doc_id").between(100, 249)).withColumn(
        "n_chars", (F.col("n_chars") * 2).cast("long")
    )
    t.merge_upsert(spark, src, ["doc_id"])
    return t.read(spark)


@register(
    "q_pulsar_wire",
    oracle="""
SELECT source AS key,
       concat('{"doc_id":', CAST(doc_id AS VARCHAR), ',"lang":"', lang, '"}') AS value
FROM documents
""",
)
def q_pulsar_wire(spark, sf_dir):
    """Producer-boundary frame: key + manually-serialized JSON value
    (byte-identical across engines; Spark's to_json field spacing is
    engine-specific, so the wire value is built with concat). The
    murmur3 partition_id the operator also emits is checked by
    q_hash_route + unit vectors, not the SQL oracle."""
    d = table(spark, sf_dir, "documents")
    value = F.concat(
        F.lit('{"doc_id":'),
        F.col("doc_id").cast("string"),
        F.lit(',"lang":"'),
        F.col("lang"),
        F.lit('"}'),
    )
    wire = pl.to_pulsar_wire(d, "source", value, num_partitions=16)
    return wire.select("key", F.col("value").cast("string").alias("value"))
