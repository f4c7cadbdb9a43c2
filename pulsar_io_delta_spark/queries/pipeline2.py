"""Round-5 pipeline surface: batch sessionization, funnel analysis,
char-entropy quality scoring, embedding centroid/quantization ops,
sliding-window document chunking, and TF-IDF top terms.

These extend the beyond-reference training-data surface (SURVEY §2.2):
the reference connector (frankxieke/pulsar-io-delta,
`DeltaLakeConnectorSource.java`) only moves rows; a corpus pipeline
also needs historical-log sessionization, quality scoring, and
embedding-column maintenance. All determinism rules follow
FIXTURES.md §5 (decimal sums, epoch-second timestamps, BIGINT casts).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pulsar_io_delta_spark.operators import text as tx
from pulsar_io_delta_spark.operators.sessionize import funnel_counts, session_stats
from pulsar_io_delta_spark.registry import register
from pulsar_io_delta_spark.tables import table


@register(
    "q_sessionize",
    oracle="""
WITH b AS (
  SELECT user_id, ts, event_id,
    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
         THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id, ts,
    sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM b
)
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(session_seq AS BIGINT) AS session_seq,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(floor(epoch(min(ts))) AS BIGINT) AS start_s,
       CAST(floor(epoch(max(ts))) AS BIGINT) AS end_s
FROM s GROUP BY user_id, session_seq
""",
)
def q_sessionize(spark, sf_dir):
    """Batch gap-sessionization (30 min) of the event log: per-session
    event count and start/end. ONE shuffle on user_id shared by the
    lag window, the running sum, and the final agg
    (operators/sessionize.py)."""
    e = table(spark, sf_dir, "events")
    return session_stats(e, gap_seconds=1800).select(
        F.col("user_id").cast("long").alias("user_id"),
        "session_seq",
        "n_events",
        "start_s",
        "end_s",
    )


@register(
    "q_funnel",
    oracle="""
WITH v AS (SELECT user_id, min(ts) AS t0 FROM events
           WHERE event_type = 'view' GROUP BY user_id),
c AS (SELECT e.user_id, min(e.ts) AS t1 FROM events e
      JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t0 GROUP BY e.user_id),
p AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
      JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t1 GROUP BY e.user_id)
SELECT 'view' AS stage, CAST((SELECT count(*) FROM v) AS BIGINT) AS n_users
UNION ALL
SELECT 'click', CAST((SELECT count(*) FROM c) AS BIGINT)
UNION ALL
SELECT 'purchase', CAST((SELECT count(*) FROM p) AS BIGINT)
""",
)
def q_funnel(spark, sf_dir):
    """Ordered funnel view → click → purchase: users reaching each
    stage strictly after their previous-stage entry. One shuffle
    (conditional mins over the same user window), no self-joins —
    the oracle's three-join formulation would scan events 3× at
    100 TB; the window form scans once."""
    e = table(spark, sf_dir, "events")
    return funnel_counts(e, ["view", "click", "purchase"])


@register(
    "q_text_entropy",
    oracle="""
WITH c AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, ''), x -> x <> '') AS chars
  FROM documents
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
  round(-CAST(coalesce(list_aggregate(
      list_transform(list_distinct(chars),
        c -> CAST((CAST(len(list_filter(chars, x -> x = c)) AS DOUBLE)
                     / greatest(len(chars), 1))
                  * ln(CAST(len(list_filter(chars, x -> x = c)) AS DOUBLE)
                     / greatest(len(chars), 1))
             AS DECIMAL(24,12))),
      'sum'), 0) AS DOUBLE), 4) AS entropy
FROM c
""",
)
def q_text_entropy(spark, sf_dir):
    """Char-level Shannon entropy per document — perplexity proxy for
    quality filtering. Zero-shuffle narrow map (operators/text.py
    with_char_entropy, sorted run-length form); p·ln p terms summed as
    DECIMAL so run/char-set iteration order can't perturb the float
    result."""
    d = table(spark, sf_dir, "documents")
    return tx.with_char_entropy(d).select(
        F.col("doc_id").cast("long").alias("doc_id"), "entropy"
    )


@register(
    "q_emb_centroid",
    oracle="""
WITH x AS (
  SELECT label, generate_subscripts(embedding, 1) - 1 AS pos,
         unnest(embedding) AS val
  FROM embeddings
)
SELECT CAST(label AS BIGINT) AS label, CAST(pos AS BIGINT) AS pos,
       CAST(count(*) AS BIGINT) AS n,
       round(CAST(sum(CAST(val AS DECIMAL(38,12))) AS DOUBLE) / count(*), 4)
         AS centroid
FROM x GROUP BY label, pos
""",
)
def q_emb_centroid(spark, sf_dir):
    """Per-label embedding centroids via posexplode + (label, pos)
    hash-agg — the distributed-safe shape: map-side partial sums bound
    the exchange at labels × dim rows regardless of corpus size (the
    row-local alternative, collecting vectors per label, would
    materialize whole groups). Element sums as DECIMAL for
    order-independence (binary floats can never tie at a decimal digit,
    so the cast rounds identically on both engines)."""
    e = table(spark, sf_dir, "embeddings")
    x = e.select("label", F.posexplode("embedding").alias("pos", "val"))
    return x.groupBy("label", "pos").agg(
        F.count("*").cast("long").alias("n"),
        F.round(
            F.sum(F.col("val").cast("decimal(38,12)")).cast("double") / F.count("*"), 4
        ).alias("centroid"),
    ).select(
        F.col("label").cast("long").alias("label"),
        F.col("pos").cast("long").alias("pos"),
        "n",
        "centroid",
    )


@register(
    "q_emb_quantize",
    oracle="""
WITH q AS (
  SELECT vec_id,
    list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS amax,
    list_transform(embedding,
      x -> CAST(round(CAST(x AS DOUBLE) * 127.0 /
             greatest(list_max(list_transform(embedding,
                                              y -> abs(CAST(y AS DOUBLE)))),
                      1e-30)) AS BIGINT)) AS qv
  FROM embeddings
)
SELECT CAST(vec_id AS BIGINT) AS vec_id, round(amax, 4) AS amax,
       CAST(list_aggregate(qv, 'sum') AS BIGINT) AS q_sum,
       CAST(list_aggregate(qv, 'min') AS BIGINT) AS q_min,
       CAST(list_aggregate(qv, 'max') AS BIGINT) AS q_max
FROM q
""",
)
def q_emb_quantize(spark, sf_dir):
    """Symmetric int8 quantization of the embedding column (absmax
    scaling, the llm.int8-style layout): row-local higher-order
    functions, zero shuffle — at 100 TB this is a pure map over the
    vector column. Output is the per-vector scale plus quantized-value
    sum/min/max (scalar contract so the oracle hash is
    representation-independent)."""
    e = table(spark, sf_dir, "embeddings")
    # Materialize amax and qv as named columns: inlining them would make
    # Catalyst re-evaluate the interpreted higher-order expression per
    # reference (amax inside every lambda element, qv 3×) — measured
    # 4.3× slower. CollapseProject keeps non-cheap aliases un-inlined,
    # so each transform runs exactly once per row (plan-asserted in
    # tests/test_sessionize.py).
    amax = F.array_max(F.transform("embedding", lambda x: F.abs(x.cast("double"))))
    qv = F.transform(
        "embedding",
        lambda x: F.round(
            x.cast("double") * F.lit(127.0) / F.greatest(F.col("_amax"), F.lit(1e-30))
        ).cast("long"),
    )
    return (
        e.withColumn("_amax", amax)
        .withColumn("_qv", qv)
        .select(
            F.col("vec_id").cast("long").alias("vec_id"),
            F.round("_amax", 4).alias("amax"),
            F.aggregate(F.col("_qv"), F.lit(0).cast("long"), lambda a, x: a + x).alias(
                "q_sum"
            ),
            F.array_min("_qv").alias("q_min"),
            F.array_max("_qv").alias("q_max"),
        )
    )


@register(
    "q_chunk_docs",
    oracle="""
WITH t AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS toks
  FROM documents
), c AS (
  SELECT doc_id, unnest(generate_series(1, greatest(len(toks), 1), 40)) AS start,
         toks
  FROM t
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(start AS BIGINT) AS start,
       CAST(len(list_slice(toks, start, least(start + 49, len(toks))))
            AS BIGINT) AS n_tok,
       array_to_string(list_slice(toks, start, least(start + 49, len(toks))),
                       ' ') AS chunk
FROM c
""",
)
def q_chunk_docs(spark, sf_dir):
    """Sliding-window document chunking (50-token windows, stride 40 —
    the context-window prep step of a training pipeline). Row-local:
    tokenize once (materialized column), explode the stride sequence,
    slice per chunk — no shuffle at all; chunk count scales with token
    count, so output size is data-proportional, never quadratic."""
    d = table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower("text"), "[^a-z0-9]+"), lambda x: x != "")
    d = d.withColumn("_toks", toks).withColumn("_n", F.size("_toks"))
    d = d.select(
        "doc_id",
        "_toks",
        "_n",
        F.explode(F.sequence(F.lit(1), F.greatest("_n", F.lit(1)), F.lit(40))).alias(
            "start"
        ),
    )
    chunk = F.slice(
        "_toks", F.col("start"), F.least(F.lit(50), F.col("_n") - F.col("start") + 1)
    )
    d = d.withColumn("_chunk", chunk)
    return d.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("start").cast("long").alias("start"),
        F.size("_chunk").cast("long").alias("n_tok"),
        F.array_join("_chunk", " ").alias("chunk"),
    )


@register(
    "q_tfidf_topterms",
    oracle="""
WITH tok AS (
  SELECT doc_id, unnest(list_filter(
           string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS token
  FROM documents
), tf AS (
  SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY doc_id, token
), df AS (
  SELECT token, count(*) AS df FROM (SELECT DISTINCT doc_id, token FROM tf)
  GROUP BY token
), n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.token,
         round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 4) AS score,
         row_number() OVER (PARTITION BY tf.doc_id
                            ORDER BY tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df)
                                     DESC, tf.token) AS rk
  FROM tf JOIN df USING (token) CROSS JOIN n
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, token, score, CAST(rk AS BIGINT) AS rk
FROM scored WHERE rk <= 3
""",
)
def q_tfidf_topterms(spark, sf_dir):
    """Top-3 TF-IDF terms per document. Shape: explode → (doc,token)
    count [the only corpus-sized shuffle] → document frequency as
    ``tf.groupBy(token).count()`` joined back broadcast — df gets
    map-side partial aggregation, so its exchange is vocab-sized even
    for stopwords. The earlier count-WINDOW-over-token form hashed
    every (doc,token) row of a token into ONE partition: windows do no
    partial aggregation, so "the" ≈ a single reducer scanning
    O(corpus-docs) rows at 100 TB. Both branches read ONE persisted tf
    (ReuseExchange alone cannot dedupe them: column pruning rewrites
    the df branch's partial aggregate into a distinct form, so the two
    exchanges stop being identical subplans and the corpus would be
    exploded twice — persist() pins the aggregate-once property,
    plan-asserted in test_sessionize). n_docs folds into the plan as a
    broadcast scalar agg (zero-column count scan), not an eager driver
    action. Ties broken by token so the rank is total-ordered."""
    return tfidf_topterms(table(spark, sf_dir, "documents"))


def tfidf_topterms(d, k: int = 3):
    """Top-k TF-IDF terms per doc over a documents frame (doc_id, text).

    See :func:`q_tfidf_topterms` for the plan-shape rationale; shared
    with tools/scale_smoke.py's stopword-heavy blow-up run."""
    from pyspark.sql import Window

    tok = d.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.lower("text"), "[^a-z0-9]+"), lambda x: x != "")
        ).alias("token"),
    )
    # MEMORY_AND_DISK: corpus-sized but post-dedup, spills instead of
    # OOMing; CacheManager canonicalization dedupes repeated builds of
    # the same plan, so bench loops don't stack cache entries.
    tf = tok.groupBy("doc_id", "token").agg(F.count("*").alias("tf")).persist()
    # vocab-sized after the map-side combine; broadcast while a vocab
    # fits an executor (~10M terms × 16 B) — beyond that drop the hint
    # and AQE plans a shuffle join on the already-aggregated side.
    df_tbl = tf.groupBy("token").agg(F.count("*").cast("long").alias("df"))
    n_tbl = d.agg(F.count("*").cast("double").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df_tbl), "token")
        .crossJoin(F.broadcast(n_tbl))
    )
    score_raw = F.col("tf") * F.log(F.col("n_docs") / F.col("df"))
    w = Window.partitionBy("doc_id").orderBy(score_raw.desc(), "token")
    return (
        scored.withColumn("score", F.round(score_raw, 4))
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select(
            F.col("doc_id").cast("long").alias("doc_id"),
            "token",
            "score",
            F.col("rk").cast("long").alias("rk"),
        )
    )


@register(
    "q_retention_cohort",
    oracle="""
WITH f AS (
  SELECT user_id, ts,
         min(date_trunc('week', ts)) OVER (PARTITION BY user_id) AS cohort_w
  FROM events
)
SELECT CAST(floor(epoch(cohort_w)) AS BIGINT) AS cohort_w,
       CAST(date_diff('week', cohort_w, date_trunc('week', ts)) AS BIGINT)
         AS week_offset,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM f
GROUP BY cohort_w, date_diff('week', cohort_w, date_trunc('week', ts))
""",
)
def q_retention_cohort(spark, sf_dir):
    """Cohort retention matrix: users grouped by first-seen week, counted
    distinct per week offset. One exchange on user_id (the cohort
    window), then a (cohort, offset) distinct-agg whose exchange is
    bounded by cohorts × weeks × users-per-cell partials — the classic
    retention shape with no self-join (the naive form joins events to a
    first-seen table, re-shuffling the 100 TB side a second time).

    Week arithmetic is integer-exact on both engines: date_trunc('week')
    is ISO-Monday in Spark and DuckDB, and the offset is a whole-week
    difference of truncated timestamps.
    """
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events")
    f = e.withColumn(
        "cohort_w",
        F.min(F.date_trunc("week", "ts")).over(Window.partitionBy("user_id")),
    )
    week_offset = (
        (F.unix_timestamp(F.date_trunc("week", "ts")) - F.unix_timestamp("cohort_w"))
        / (7 * 86400)
    ).cast("long")
    return (
        f.select(
            F.unix_timestamp("cohort_w").cast("long").alias("cohort_w"),
            week_offset.alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_w", "week_offset")
        .agg(F.countDistinct("user_id").cast("long").alias("n_users"))
    )


@register(
    "q_time_rollup_multires",
    oracle="""
WITH h AS (
  SELECT time_bucket(INTERVAL '1 hour', ts) AS b, event_type,
         count(*) AS cnt, sum(CAST(value AS DECIMAL(18,2))) AS sv
  FROM events GROUP BY 1, 2),
d AS (
  SELECT time_bucket(INTERVAL '1 day', b) AS b, event_type,
         sum(cnt) AS cnt, sum(sv) AS sv
  FROM h GROUP BY 1, 2)
SELECT 'hour' AS res, CAST(floor(epoch(b)) AS BIGINT) AS bucket_start,
       event_type, CAST(cnt AS BIGINT) AS cnt,
       round(CAST(sv AS DOUBLE), 4) AS sum_value
FROM h
UNION ALL
SELECT 'day', CAST(floor(epoch(b)) AS BIGINT), event_type,
       CAST(cnt AS BIGINT), round(CAST(sv AS DOUBLE), 4)
FROM d
""",
)
def q_time_rollup_multires(spark, sf_dir):
    """Hypertable-style multi-resolution rollup (continuous-aggregate
    cascade): hourly (bucket, type) aggregates, then DAILY aggregates
    computed FROM the hourly partials — at 100 TB the day level reads
    hours × types rows, never the raw corpus, and the union's two
    branches share one corpus aggregation via AQE stage reuse (the
    hourly subplans are identical — no pruning asymmetry here, unlike
    TF-IDF's df branch — so the FINAL adaptive plan carries a
    ReusedExchange; plan-asserted post-execution in test_sessionize).
    Hour sums stay exact decimals until the output projection, so the
    day level is a sum of exact partials, not of rounded doubles —
    resolution cascades can't accumulate float error."""
    e = table(spark, sf_dir, "events")
    h = e.groupBy(F.date_trunc("hour", "ts").alias("b"), "event_type").agg(
        F.count("*").alias("cnt"),
        F.sum(F.col("value").cast("decimal(18,2)")).alias("sv"),
    )
    d = h.groupBy(F.date_trunc("day", "b").alias("b"), "event_type").agg(
        F.sum("cnt").alias("cnt"),
        F.sum("sv").alias("sv"),
    )

    def fmt(df, res):
        return df.select(
            F.lit(res).alias("res"),
            F.unix_timestamp("b").cast("long").alias("bucket_start"),
            "event_type",
            F.col("cnt").cast("long").alias("cnt"),
            F.round(F.col("sv").cast("double"), 4).alias("sum_value"),
        )

    return fmt(h, "hour").unionAll(fmt(d, "day"))


@register(
    "q_stratified_sample",
    oracle="""
SELECT doc_id, lang, rk FROM (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, lang,
         CAST(row_number() OVER (PARTITION BY lang
                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rk
  FROM documents)
WHERE rk <= 50
""",
)
def q_stratified_sample(spark, sf_dir):
    """Stratified exact-k sampling: 50 documents per language, chosen
    by a deterministic hash order (md5 of the id — identical hex on
    both engines, so the oracle reproduces the exact sample). The
    training-data quota step "take k per stratum": one shuffle on the
    stratum key, per-partition streaming top-k via WindowGroupLimit
    (rank <= k prunes before the full sort materializes — Spark plans
    a partial group-limit map-side, so the exchange carries at most
    k rows per stratum per input partition, not the corpus)."""
    from pyspark.sql import Window

    d = table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        d.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            "lang",
            F.row_number().over(w).cast("long").alias("rk"),
        )
        .where(F.col("rk") <= 50)
    )


@register(
    "q_scd2_dim",
    oracle="""
WITH seq AS (
  SELECT user_id, ts, event_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_state
  FROM events
), changes AS (
  SELECT user_id, ts, event_id, event_type FROM seq
  WHERE prev_state IS NULL OR prev_state <> event_type
)
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(row_number() OVER w AS BIGINT) AS version,
       event_type AS state,
       ts AS valid_from,
       lead(ts) OVER w AS valid_to,
       (lead(ts) OVER w IS NULL) AS is_current
FROM changes
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
)
def q_scd2_dim(spark, sf_dir):
    """Slowly-changing-dimension (Type 2) build from an event log: per
    user, collapse consecutive repeats of the tracked attribute
    (event_type stands in for the dimension state), then emit
    versioned rows with [valid_from, valid_to) ranges and an
    is_current flag — the standard warehouse shape a CDC stream (the
    reference's whole output surface) is folded into downstream.

    Plan shape: all three passes (change detection lag, versioning
    row_number, range-closing lead) run over windows partitioned on
    user_id with compatible sort keys, so Catalyst plans ONE exchange
    + ONE sort on user_id and pipelines the window operators — at
    100 TB the job is a single user-keyed shuffle, same as
    q_sessionize."""
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        e.select("user_id", "ts", "event_id", "event_type")
        .withColumn("prev_state", F.lag("event_type").over(w))
        .where(F.col("prev_state").isNull() | (F.col("prev_state") != F.col("event_type")))
    )
    return changes.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.row_number().over(w).cast("long").alias("version"),
        F.col("event_type").alias("state"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        F.lead("ts").over(w).isNull().alias("is_current"),
    )


@register(
    "q_bm25_topdocs",
    oracle="""
WITH tok AS (
  SELECT doc_id, unnest(list_filter(
           string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS token
  FROM documents
), tf AS (
  SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY doc_id, token
), dl AS (
  SELECT doc_id, CAST(sum(tf) AS DOUBLE) AS dl FROM tf GROUP BY doc_id
), stats AS (
  SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM dl
), qdf AS (
  SELECT token, CAST(count(*) AS DOUBLE) AS df FROM tf
  WHERE token IN ('spark', 'merge', 'window') GROUP BY token
), scored AS (
  SELECT tf.doc_id,
         sum(ln(1 + (s.n_docs - qdf.df + 0.5) / (qdf.df + 0.5))
             * tf.tf * 2.2 / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl)))
           AS score
  FROM tf JOIN qdf USING (token)
  JOIN dl USING (doc_id) CROSS JOIN stats s
  GROUP BY tf.doc_id
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, round(score, 4) AS score,
       CAST(row_number() OVER (ORDER BY round(score, 4) DESC, doc_id)
            AS BIGINT) AS rk
FROM scored
ORDER BY rk LIMIT 10
""",
)
def q_bm25_topdocs(spark, sf_dir):
    """BM25 retrieval (k1=1.2, b=0.75): top-10 documents for a fixed
    3-term query. Beyond TF-IDF this adds the two Okapi ingredients —
    term-frequency saturation and document-length normalization
    (dl/avgdl) — the standard lexical scorer for training-data
    curation (query-targeted subcorpus selection).

    Plan shape: ONE corpus-sized shuffle builds (doc,token) counts,
    persisted and reused for per-doc length and for scoring; the
    query-term df table is 3 rows (broadcast), corpus stats fold in as
    a broadcast scalar agg. Scoring touches only rows whose token is a
    query term — the semi-filter runs before any join. Ranking uses
    the ROUNDED score (ties then doc_id) so the order is identical
    across engines regardless of float summation order."""
    return _bm25_shape(table(spark, sf_dir, "documents"))


def bm25_scores(d, terms, k1: float = 1.2, b: float = 0.75):
    """BM25 (doc_id, score) over a (doc_id, text) frame — shared by
    q_bm25_topdocs, q_rank_fusion and tools/scale_smoke.py so the
    smoked shape is the shipped shape.

    Round-13 restructure (the bm25 drift-watch fix): document length
    comes from a WINDOW over the doc-partitioned tf table instead of a
    groupBy + join-back. The old chain moved the full tf table through
    FOUR exchanges (tf build, dl groupBy, the dl equi-join, the score
    groupBy); the window shape moves it through TWO — tf build on
    (doc, token), then ONE doc_id exchange that simultaneously feeds
    the dl window, the corpus stats, and the final per-doc score
    aggregate (already co-partitioned, no further shuffle). Measured
    at sf0.1 on a quiet rig: 2.64 s → 1.22 s median (the r7 anchor is
    1.24 s — the drift was stage-count overhead, not data volume)."""
    from pyspark.sql import Window

    tok = d.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.lower("text"), "[^a-z0-9]+"), lambda x: x != "")
        ).alias("token"),
    )
    tf = tok.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    tfdl = tf.withColumn(
        "dl", F.sum("tf").over(Window.partitionBy("doc_id")).cast("double")
    ).persist()
    stats = (
        tfdl.groupBy("doc_id")
        .agg(F.max("dl").alias("dl"))
        .agg(F.count("*").cast("double").alias("n_docs"), F.avg("dl").alias("avgdl"))
    )
    qtf = tfdl.where(F.col("token").isin(terms))
    qdf = qtf.groupBy("token").agg(F.count("*").cast("double").alias("df"))
    idf = F.log(F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    sat = (F.col("tf") * (k1 + 1)) / (
        F.col("tf") + k1 * ((1 - b) + b * F.col("dl") / F.col("avgdl"))
    )
    return (
        qtf.join(F.broadcast(qdf), "token")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.sum(idf * sat).alias("score"))
    )


def _bm25_shape(d):
    from pyspark.sql import Window

    scored = bm25_scores(d, ["spark", "merge", "window"])
    w = Window.orderBy(F.round("score", 4).desc(), "doc_id")
    return (
        scored.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.round("score", 4).alias("score"),
            F.row_number().over(w).cast("long").alias("rk"),
        )
        .where(F.col("rk") <= 10)
        .orderBy("rk")
    )


@register(
    "q_ewma",
    oracle="""
WITH l AS (
  SELECT event_id, user_id,
         list(CAST(CAST(value AS DECIMAL(18,2)) AS DECIMAL(30,22)))
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS lst
  FROM events
)
SELECT event_id, user_id,
       CAST(round(list_reduce(lst,
              (acc, x) -> CAST(0.3 * x + 0.7 * acc AS DECIMAL(30,22))), 4)
            AS DOUBLE) AS ewma10
FROM l
""",
)
def q_ewma(spark, sf_dir):
    """Exponentially weighted moving average over the trailing 10
    events per user — the time-series smoother whose recurrence
    (ewma_t = \u03b1x_t + (1-\u03b1)ewma_{t-1}) has no closed-form SQL
    aggregate. Expressed as a HIGHER-ORDER FOLD over a bounded window
    frame list: collect the 10-row frame, left-fold with the first
    element as the seed — the exact shape DuckDB's list_reduce uses.

    Determinism: the fold runs in EXACT decimal arithmetic, not
    doubles. A double fold is NOT engine-portable — measured at sf0.1,
    three rows straddled the 4-dp rounding boundary because the C++
    engine contracts a*x+b*acc differently (FMA) than the JVM's
    strict IEEE sequence. Instead: quantize to the fixture's 2-dp
    scale (both engines recover exactly k/100 — binary-vs-shortest-
    repr cast differences vanish at 2 dp), then fold in
    decimal(30,22). Each step adds one decimal digit (\u03b1=0.3), so 10
    steps need \u226412 of the 22 fractional digits — no rounding ever
    occurs, and exact arithmetic agrees everywhere. JVM-side
    throughout (codegen'd higher-order function, no UDF); state per
    row is bounded at 10 decimals, one user-key window shuffle."""
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-9, 0)
    )
    q = F.col("value").cast("decimal(18,2)").cast("decimal(30,22)")
    frames = e.select(
        "event_id", "user_id", F.collect_list(q).over(w).alias("lst")
    )
    rest = F.slice(
        F.col("lst"), 2, F.greatest(F.size("lst") - 1, F.lit(0))
    )
    a, b = F.lit("0.3").cast("decimal(2,1)"), F.lit("0.7").cast("decimal(2,1)")
    fold = F.aggregate(
        rest,
        F.element_at(F.col("lst"), 1),
        lambda acc, x: (a * x + b * acc).cast("decimal(30,22)"),
    )
    return frames.select(
        "event_id",
        "user_id",
        # Round in DECIMAL space via round(), not a decimal CAST: the
        # exact fold often lands ON the 4-dp half boundary (2-dp
        # inputs x {0.3,0.7} weights), where double-round diverges
        # between engines, and DuckDB's decimal-narrowing CAST
        # truncates; round() on decimals is half-away-from-zero in
        # both engines.
        F.round(fold, 4).cast("double").alias("ewma10"),
    )


@register(
    "q_anomaly_zscore",
    oracle="""
WITH q AS (
  SELECT event_id, user_id, ts,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS xq
  FROM events
), s AS (
  SELECT event_id, user_id, xq,
         CAST(count(*) OVER w AS BIGINT) AS n,
         CAST(sum(xq) OVER w AS BIGINT) AS sx,
         CAST(sum(xq * xq) OVER w AS BIGINT) AS sxx
  FROM q
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
)
SELECT event_id, user_id,
       ((xq * n - sx) * (xq * n - sx) > 4 * (n * sxx - sx * sx))
         AS is_outlier
FROM s
""",
)
def q_anomaly_zscore(spark, sf_dir):
    """Rolling z-score outlier flag over the trailing 20 events per
    user: |x − μ| > 2σ, evaluated WITHOUT a single float operation.
    Quantize to the fixture's 2-dp scale (exact 16-digit-safe longs),
    keep windowed count/sum/sum-of-squares as longs, and compare
    (x·n − S)² > 4·(n·SS − S²) — the σ² denominator cancels, so the
    flag is pure integer arithmetic and bit-identical on any engine
    (the EWMA fold showed why float window math is not). Magnitudes:
    |x·n| ≤ 2e6 scaled units, both sides ≤ 4e12 ≪ 2⁶³. One user-key
    exchange; all three window aggregates share the frame."""
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events")
    xq = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-19, 0)
    )
    s = e.select(
        "event_id",
        "user_id",
        xq.alias("xq"),
        F.count("*").over(w).alias("n"),
        F.sum(xq).over(w).alias("sx"),
        F.sum(xq * xq).over(w).alias("sxx"),
    )
    dev = F.col("xq") * F.col("n") - F.col("sx")
    return s.select(
        "event_id",
        "user_id",
        (dev * dev > 4 * (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))).alias(
            "is_outlier"
        ),
    )


@register(
    "q_hampel_filter",
    oracle="""
WITH q AS (
  SELECT event_id, user_id, ts,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS xq
  FROM events
), f AS (
  SELECT event_id, user_id, xq,
         list(xq) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN 14 PRECEDING AND CURRENT ROW) AS lst
  FROM q
), m AS (
  SELECT event_id, user_id, xq, lst, len(lst) AS n,
         list_sort(lst)[CAST((len(lst)+1)//2 AS INT)]
           + list_sort(lst)[CAST(len(lst)//2 AS INT) + 1] AS med2
  FROM f
), d AS (
  SELECT event_id, user_id, xq, med2, n,
         list_sort(list_transform(lst, x -> abs(2*x - med2))) AS devs
  FROM m
)
SELECT event_id, user_id,
       (2 * abs(2*xq - med2)
          > 3 * (devs[CAST((n+1)//2 AS INT)] + devs[CAST(n//2 AS INT) + 1]))
         AS is_outlier
FROM d
""",
)
def q_hampel_filter(spark, sf_dir):
    """Hampel filter: rolling-median/MAD outlier flag over the trailing
    15 events per user — the robust-statistics companion to
    q_anomaly_zscore (a median/MAD detector is not dragged by the
    outliers it is hunting). Like the z-score it is evaluated with
    ZERO float operations: medians live in doubled integer space
    (med2 = sum of the two middle order statistics = 2·median, exact
    for odd and even frames alike), deviations are |2x − med2| =
    2|x − median|, and the flag compares 2·|2x − med2| > 3·mad2 —
    algebraically |x − med| > 3·MAD with every quantity a long.
    (The 1.4826 Gaussian-consistency constant is deliberately folded
    out — a rational threshold keeps the predicate integer-exact.)
    Sorting happens per-row over a bounded 15-element frame list via
    codegen'd array kernels; one user-key exchange."""
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events")
    xq = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-14, 0)
    )
    f = e.select(
        "event_id", "user_id", xq.alias("xq"), F.collect_list(xq).over(w).alias("lst")
    )
    n = F.size("lst")
    i1 = ((n + 1) / 2).cast("int")
    i2 = (n / 2).cast("int") + 1
    srt = F.array_sort("lst")
    m = f.select(
        "event_id",
        "user_id",
        "xq",
        "lst",
        n.alias("n"),
        (F.element_at(srt, i1) + F.element_at(srt, i2)).alias("med2"),
    )
    devs = F.array_sort(
        F.transform("lst", lambda x: F.abs(2 * x - F.col("med2")))
    )
    d = m.select("event_id", "user_id", "xq", "med2", "n", devs.alias("devs"))
    nn = F.col("n")
    j1 = ((nn + 1) / 2).cast("int")
    j2 = (nn / 2).cast("int") + 1
    mad2 = F.element_at("devs", j1) + F.element_at("devs", j2)
    return d.select(
        "event_id",
        "user_id",
        (2 * F.abs(2 * F.col("xq") - F.col("med2")) > 3 * mad2).alias("is_outlier"),
    )


@register(
    "q_markov_transitions",
    oracle="""
WITH s AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS next_type
  FROM events
)
SELECT event_type AS from_state, next_type AS to_state,
       CAST(count(*) AS BIGINT) AS transitions,
       CAST(sum(count(*)) OVER (PARTITION BY event_type) AS BIGINT)
         AS from_total
FROM s WHERE next_type IS NOT NULL
GROUP BY event_type, next_type
""",
)
def q_markov_transitions(spark, sf_dir):
    """First-order Markov transition counts over per-user event
    sequences (behavioral modeling / next-event prediction features).
    Counts and row totals stay as longs — the transition probability
    is transitions/from_total, left to the consumer so the contract
    needs no float. Plan: ONE user-key window exchange for the lead,
    then a states²-bounded aggregation (map-side combined) — the
    second window runs over the tiny aggregated frame, not the
    corpus."""
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = e.select(
        "user_id",
        "event_type",
        F.lead("event_type").over(w).alias("next_type"),
    ).where(F.col("next_type").isNotNull())
    agg = s.groupBy(
        F.col("event_type").alias("from_state"), F.col("next_type").alias("to_state")
    ).agg(F.count("*").cast("long").alias("transitions"))
    wtot = Window.partitionBy("from_state")
    return agg.select(
        "from_state",
        "to_state",
        "transitions",
        F.sum("transitions").over(wtot).cast("long").alias("from_total"),
    )


@register(
    "q_profile_stats",
    oracle="""
SELECT 'l_quantity' AS col, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(l_quantity) AS BIGINT) AS n_nonnull,
       CAST(count(DISTINCT l_quantity) AS BIGINT) AS n_distinct,
       CAST(min(l_quantity) AS DOUBLE) AS min_v,
       CAST(max(l_quantity) AS DOUBLE) AS max_v
FROM lineitem
UNION ALL
SELECT 'l_discount', count(*), count(l_discount),
       count(DISTINCT l_discount),
       CAST(min(l_discount) AS DOUBLE), CAST(max(l_discount) AS DOUBLE)
FROM lineitem
UNION ALL
SELECT 'l_returnflag_len', count(*), count(l_returnflag),
       count(DISTINCT l_returnflag),
       CAST(min(length(l_returnflag)) AS DOUBLE),
       CAST(max(length(l_returnflag)) AS DOUBLE)
FROM lineitem
""",
)
def q_profile_stats(spark, sf_dir):
    """Data-quality profiling: per-column row/non-null/distinct counts
    and min/max over lineitem — the observability pass every ingest
    pipeline runs before training-data admission. All three column
    profiles compute in ONE scan via a multi-aggregate projection
    (Spark plans a single Aggregate over the file scan; the oracle's
    3-way UNION is the semantic spec, not the plan). Counts exact
    longs; min/max are existing values (no float arithmetic beyond a
    widening cast)."""
    l = table(spark, sf_dir, "lineitem")
    one = l.agg(
        F.count("*").cast("long").alias("n_rows"),
        F.count("l_quantity").cast("long").alias("nn_q"),
        F.countDistinct("l_quantity").cast("long").alias("nd_q"),
        F.min("l_quantity").cast("double").alias("mn_q"),
        F.max("l_quantity").cast("double").alias("mx_q"),
        F.count("l_discount").cast("long").alias("nn_d"),
        F.countDistinct("l_discount").cast("long").alias("nd_d"),
        F.min("l_discount").cast("double").alias("mn_d"),
        F.max("l_discount").cast("double").alias("mx_d"),
        F.count("l_returnflag").cast("long").alias("nn_s"),
        F.countDistinct("l_returnflag").cast("long").alias("nd_s"),
        F.min(F.length("l_returnflag")).cast("double").alias("mn_s"),
        F.max(F.length("l_returnflag")).cast("double").alias("mx_s"),
    )
    rows = F.array(
        F.struct(
            F.lit("l_quantity").alias("col"), F.col("n_rows").alias("n_rows"),
            F.col("nn_q").alias("n_nonnull"), F.col("nd_q").alias("n_distinct"),
            F.col("mn_q").alias("min_v"), F.col("mx_q").alias("max_v"),
        ),
        F.struct(
            F.lit("l_discount").alias("col"), F.col("n_rows").alias("n_rows"),
            F.col("nn_d").alias("n_nonnull"), F.col("nd_d").alias("n_distinct"),
            F.col("mn_d").alias("min_v"), F.col("mx_d").alias("max_v"),
        ),
        F.struct(
            F.lit("l_returnflag_len").alias("col"), F.col("n_rows").alias("n_rows"),
            F.col("nn_s").alias("n_nonnull"), F.col("nd_s").alias("n_distinct"),
            F.col("mn_s").alias("min_v"), F.col("mx_s").alias("max_v"),
        ),
    )
    return (
        one.select(F.explode(rows).alias("p"))
        .select("p.col", "p.n_rows", "p.n_nonnull", "p.n_distinct", "p.min_v", "p.max_v")
    )


@register(
    "q_inverted_index",
    oracle="""
WITH tok AS (
  SELECT doc_id, unnest(list_filter(
           string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS token
  FROM documents
), tf AS (
  SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY doc_id, token
), stats AS (
  SELECT token, CAST(count(*) AS BIGINT) AS df, CAST(sum(tf) AS BIGINT) AS cf
  FROM tf GROUP BY token
), rk AS (
  SELECT token, doc_id, tf,
         row_number() OVER (PARTITION BY token ORDER BY tf DESC, doc_id) AS rk
  FROM tf
), post AS (
  SELECT token, string_agg(doc_id || ':' || tf, ',' ORDER BY rk) AS postings
  FROM rk WHERE rk <= 8 GROUP BY token
)
SELECT s.token, s.df, s.cf, p.postings
FROM stats s JOIN post p USING (token)
""",
)
def q_inverted_index(spark, sf_dir):
    """Inverted-index build: token → (document frequency, collection
    frequency, top-8 posting list "doc:tf" ordered by tf desc / doc_id)
    — the retrieval-index artifact a decontamination / search-serving
    pipeline materializes from a corpus.

    Scale shape: ONE corpus-sized (doc,token) exchange builds tf
    (map-side combined, persisted, reused by all three consumers —
    the aggregate-once contract from q_tfidf_topterms); df/cf are a
    vocab-sized partial agg on top. The top-8 posting selection is the
    part a naive plan gets wrong: a window keyed on token alone hashes
    every row of a stopword into ONE reducer (no partial aggregation in
    windows — the same hot-key failure PERF.md documents for the tfidf
    df-by-window form). Here top-k runs in TWO phases: phase 1 windows
    over (token, salt-of-doc_id) — a stopword's rows split across SALT
    reducers, per-reducer group size = docs-with-token / SALT (size
    SALT to the corpus like adaptive_planes does for LSH planes) —
    phase 2 re-ranks the ≤ 8×SALT salt-winners per token, a bounded
    set, so the token-keyed window touches O(vocab × 8·SALT) rows
    total. Postings assemble from ≤ 8 rank-carrying structs per token
    (array_sort on the unique rank is deterministic), never an
    unbounded collect_list."""
    return inverted_index(table(spark, sf_dir, "documents"))


def inverted_index(d, k: int = 8, salt: int = 16):
    """token → (df, cf, top-k postings) over (doc_id, text). See
    :func:`q_inverted_index` for the salted two-phase top-k rationale."""
    from pyspark.sql import Window

    tok = d.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.lower("text"), "[^a-z0-9]+"), lambda x: x != "")
        ).alias("token"),
    )
    tf = tok.groupBy("doc_id", "token").agg(F.count("*").alias("tf")).persist()
    stats = tf.groupBy("token").agg(
        F.count("*").cast("long").alias("df"),
        F.sum("tf").cast("long").alias("cf"),
    )
    salted = tf.withColumn(
        "_salt", F.pmod(F.xxhash64("doc_id"), F.lit(salt)).cast("int")
    )
    w1 = Window.partitionBy("token", "_salt").orderBy(F.desc("tf"), F.asc("doc_id"))
    survivors = (
        salted.withColumn("_rk", F.row_number().over(w1))
        .where(F.col("_rk") <= k)
        .drop("_salt", "_rk")
    )
    w2 = Window.partitionBy("token").orderBy(F.desc("tf"), F.asc("doc_id"))
    top = survivors.withColumn("rk", F.row_number().over(w2)).where(F.col("rk") <= k)
    postings = (
        top.groupBy("token")
        .agg(F.array_sort(F.collect_list(F.struct("rk", "doc_id", "tf"))).alias("ps"))
        .select(
            "token",
            F.array_join(
                F.transform(
                    F.col("ps"),
                    lambda s: F.concat_ws(
                        ":", s["doc_id"].cast("string"), s["tf"].cast("string")
                    ),
                ),
                ",",
            ).alias("postings"),
        )
    )
    return stats.join(postings, "token").select("token", "df", "cf", "postings")


@register(
    "q_rank_fusion",
    oracle="""
WITH cand AS (
  SELECT d.doc_id, d.text, e.embedding::DOUBLE[] AS v
  FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
  WHERE d.doc_id <> 0),
qv AS (
  SELECT embedding::DOUBLE[] AS qv,
         list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) AS qn2
  FROM embeddings WHERE vec_id = 0),
tok AS (
  SELECT doc_id, unnest(list_filter(
           string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS token
  FROM cand),
tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY doc_id, token),
dl AS (SELECT doc_id, CAST(sum(tf) AS DOUBLE) AS dl FROM tf GROUP BY doc_id),
stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM dl),
qdf AS (SELECT token, CAST(count(*) AS DOUBLE) AS df FROM tf
        WHERE token IN ('spark', 'merge', 'window') GROUP BY token),
lex AS (
  SELECT tf.doc_id,
         sum(ln(1 + (s.n_docs - qdf.df + 0.5) / (qdf.df + 0.5))
             * tf.tf * 2.2 / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl)))
           AS score
  FROM tf JOIN qdf USING (token)
  JOIN dl USING (doc_id) CROSS JOIN stats s
  GROUP BY tf.doc_id),
lexr AS (
  SELECT doc_id,
         CAST(row_number() OVER (ORDER BY round(score, 4) DESC, doc_id)
              AS BIGINT) AS lex_rk
  FROM lex),
denser AS (
  SELECT c.doc_id,
         CAST(row_number() OVER (
                ORDER BY list_dot_product(c.v, q.qv)
                         / sqrt(list_dot_product(c.v, c.v) * q.qn2) DESC,
                         c.doc_id)
              AS BIGINT) AS dense_rk
  FROM cand c CROSS JOIN qv q),
fused AS (
  SELECT doc_id, l.lex_rk, d2.dense_rk,
         COALESCE(1.0 / (60 + l.lex_rk), 0)
           + COALESCE(1.0 / (60 + d2.dense_rk), 0) AS rrf
  FROM (SELECT * FROM lexr WHERE lex_rk <= 50) l
  FULL JOIN (SELECT * FROM denser WHERE dense_rk <= 50) d2 USING (doc_id))
SELECT doc_id, lex_rk, dense_rk, round(rrf, 6) AS rrf_r,
       CAST(row_number() OVER (ORDER BY round(rrf, 6) DESC, doc_id)
            AS BIGINT) AS rk
FROM fused
ORDER BY rk LIMIT 10
""",
)
def q_rank_fusion(spark, sf_dir):
    """Hybrid retrieval via Reciprocal Rank Fusion (RRF, k=60 — the
    Cormack/Clarke/Buettcher fusion that needs only RANKS, no score
    calibration): fuse a BM25 lexical ranking with a dense
    embedding-cosine ranking over the documents that carry embeddings
    (doc_id = vec_id), query = doc 0's embedding + the fixed 3-term
    lexical query. Top-50 from each ranker, rrf = Σ 1/(60+rank) with
    absent-from-a-list contributing 0, final top-10 by (rrf, doc_id).
    This is the standard training-data curation shape for
    query-targeted subcorpus selection when neither ranker alone is
    trusted.

    Determinism: both rankings order by ROUNDED/bit-exact keys with
    doc_id tiebreaks (BM25 on round(score,4) like q_bm25_topdocs;
    cosine on the raw double — same sequential-fold dot product both
    engines, the q_sim_topk contract), and the RRF sum is two exact
    divisions + one add, identical across engines; ranked on round 6dp.

    Scale shape: the lexical side is the q_bm25_topdocs plan (one
    (doc,token) shuffle, broadcast query-term df + corpus stats); the
    dense side broadcasts ONE query vector; each ranker emits a top-50
    via windowed rank (at 100 TB: per-partition partial top-k then a
    50-row global merge); the fusion join touches ≤100 rows total."""
    from pyspark.sql import Window

    from pulsar_io_delta_spark.operators import similarity as sim

    RRF_K, TOP = 60, 50
    emb = sim.with_norm2(table(spark, sf_dir, "embeddings"))
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    cand = docs.join(
        emb.select(F.col("vec_id").alias("doc_id"), "v", "v_n2"), "doc_id"
    ).where(F.col("doc_id") != 0)

    # lexical: BM25 over the candidate subcorpus (q_bm25_topdocs scorer)
    lex = bm25_scores(cand.select("doc_id", "text"), ["spark", "merge", "window"])
    wl = Window.orderBy(F.round("score", 4).desc(), "doc_id")
    lexr = (
        lex.select("doc_id", F.row_number().over(wl).cast("long").alias("lex_rk"))
        .where(F.col("lex_rk") <= TOP)
    )

    # dense: cosine to doc 0's embedding, broadcast single query vector
    q = emb.where(F.col("vec_id") == 0).select(
        F.col("v").alias("qv"), F.col("v_n2").alias("qv_n2")
    )
    wd = Window.orderBy(
        F.desc(sim.cosine_col("v", "qv", "v_n2", "qv_n2")), F.asc("doc_id")
    )
    denser = (
        cand.crossJoin(F.broadcast(q))
        .select("doc_id", F.row_number().over(wd).cast("long").alias("dense_rk"))
        .where(F.col("dense_rk") <= TOP)
    )

    fused = lexr.join(denser, "doc_id", "full").select(
        "doc_id",
        "lex_rk",
        "dense_rk",
        (
            F.coalesce(F.lit(1.0) / (RRF_K + F.col("lex_rk")), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (RRF_K + F.col("dense_rk")), F.lit(0.0))
        ).alias("rrf"),
    )
    wf = Window.orderBy(F.round("rrf", 6).desc(), "doc_id")
    return (
        fused.select(
            "doc_id",
            "lex_rk",
            "dense_rk",
            F.round("rrf", 6).alias("rrf_r"),
            F.row_number().over(wf).cast("long").alias("rk"),
        )
        .where(F.col("rk") <= 10)
        .orderBy("rk")
    )
