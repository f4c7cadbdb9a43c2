"""Additional operator coverage: pivot, analytic-window variants,
content-hash dedup, BPE-ish token counting, and a custom stateful
streaming operator via applyInPandasWithState.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.window import Window

from pulsar_io_delta_spark.registry import register
from pulsar_io_delta_spark.streaming.runner import events_stream, run_to_memory
from pulsar_io_delta_spark.tables import table

PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


@register(
    "q_udtf_tokens",
    oracle="""
SELECT doc_id, i AS pos, toks[CAST(i + 1 AS INT)] AS token
FROM (SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks
      FROM documents), range(5) t(i)
WHERE i < len(toks)
""",
)
def q_udtf_tokens(spark, sf_dir):
    """Python UDTF (table function): one row per leading token of each
    document — the UDTF modality of the UDF surface. Registered and
    invoked through LATERAL in Spark SQL."""
    import re

    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, pos bigint, token string")
    class LeadingTokens:
        def eval(self, doc_id: int, text: str):
            toks = [t for t in re.split(r"[^a-z0-9]+", (text or "").lower()) if t]
            for i, tok in enumerate(toks[:5]):
                yield doc_id, i, tok

    table(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    spark.udtf.register("leading_tokens", LeadingTokens)
    return spark.sql(
        "SELECT t.* FROM documents d, LATERAL leading_tokens(d.doc_id, d.text) t"
    )


@register(
    "q_pivot",
    oracle="""
SELECT o_orderstatus,
       CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS BIGINT) AS "1-URGENT",
       CAST(sum(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 END) AS BIGINT) AS "2-HIGH",
       CAST(sum(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 END) AS BIGINT) AS "3-MEDIUM",
       CAST(sum(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 END) AS BIGINT) AS "4-NOT SPECIFIED",
       CAST(sum(CASE WHEN o_orderpriority = '5-LOW' THEN 1 END) AS BIGINT) AS "5-LOW"
FROM orders GROUP BY o_orderstatus
""",
)
def q_pivot(spark, sf_dir):
    """DataFrame pivot with explicit value list — at scale, listing the
    pivot values avoids the extra distinct-values job."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").pivot("o_orderpriority", PRIORITIES).count()


@register(
    "q_window_variants",
    oracle="""
SELECT o_orderkey, o_orderpriority, o_totalprice,
       CAST(dense_rank() OVER w AS BIGINT) AS drnk,
       percent_rank() OVER w AS prnk,
       cume_dist() OVER w AS cdist,
       CAST(ntile(4) OVER w AS BIGINT) AS quartile
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey)
""",
)
def q_window_variants(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.percent_rank().over(w).alias("prnk"),
        F.cume_dist().over(w).alias("cdist"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
    )


@register(
    "q_dedup_hash",
    oracle="""
SELECT md5(text) AS h, min(doc_id) AS keep_id, count(*) AS copies
FROM (SELECT * FROM documents UNION ALL SELECT * FROM documents)
GROUP BY md5(text)
""",
)
def q_dedup_hash(spark, sf_dir):
    """Content-hash dedup — the 100 TB shape for exact dedup: shuffle
    16-byte digests, never full documents."""
    d = table(spark, sf_dir, "documents")
    doubled = d.unionAll(d)
    return doubled.groupBy(F.md5(F.encode(F.col("text"), "UTF-8")).alias("h")).agg(
        F.min("doc_id").alias("keep_id"), F.count("*").alias("copies")
    )


@register(
    "q_text_token_count",
    oracle="""
SELECT doc_id,
       CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT)
         AS n_bpe,
       CAST(len(string_split_regex(text, ' ')) AS BIGINT) AS n_ws,
       round(CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS DOUBLE)
             / greatest(len(string_split_regex(text, ' ')), 1), 4) AS bpe_per_word
FROM documents
""",
)
def q_text_token_count(spark, sf_dir):
    """Token counting two ways: whitespace words and a BPE-ish regex
    (alpha runs | digit runs | single punctuation) — the usual cheap
    proxy for LLM token budgeting."""
    d = table(spark, sf_dir, "documents")
    bpe = F.size(F.expr("regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)")).cast("long")
    ws = F.size(F.split(F.col("text"), " ")).cast("long")
    return d.select(
        "doc_id",
        bpe.alias("n_bpe"),
        ws.alias("n_ws"),
        F.round(bpe.cast("double") / F.greatest(ws, F.lit(1)), 4).alias("bpe_per_word"),
    )


@register(
    "q_string_funcs2",
    oracle="""
SELECT p_partkey,
       CAST(levenshtein(p_brand, 'Brand#00') AS BIGINT) AS lev,
       split_part(p_type, ' ', 1) AS type_head,
       translate(p_brand, '#', '-') AS tbrand,
       lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_pad,
       reverse(p_brand) AS rbrand,
       repeat(left(p_name, 2), 2) AS rep2,
       CAST(strpos(p_name, 'a') AS BIGINT) AS a_pos,
       right(p_type, 3) AS type_tail
FROM part
""",
)
def q_string_funcs2(spark, sf_dir):
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.levenshtein(F.col("p_brand"), F.lit("Brand#00")).cast("long").alias("lev"),
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("type_head"),
        F.translate(F.col("p_brand"), "#", "-").alias("tbrand"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_pad"),
        F.reverse(F.col("p_brand")).alias("rbrand"),
        F.repeat(F.substring("p_name", 1, 2), 2).alias("rep2"),
        F.instr(F.col("p_name"), "a").cast("long").alias("a_pos"),
        F.substring(F.col("p_type"), -3, 3).alias("type_tail"),
    )


@register(
    "q_date_funcs2",
    oracle="""
SELECT o_orderkey,
       CAST(last_day(o_orderdate) AS DATE) AS month_end,
       CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus3m,
       CAST(o_orderdate - INTERVAL 7 DAY AS DATE) AS minus7d,
       CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
       CAST(weekofyear(o_orderdate) AS BIGINT) AS woy,
       CAST(dayofyear(o_orderdate) AS BIGINT) AS doy,
       CAST(isodow(o_orderdate) AS BIGINT) AS dow_iso
FROM orders
""",
)
def q_date_funcs2(spark, sf_dir):
    """Calendar arithmetic parity incl. month-end clamping (Jan 31 + 1
    month = Feb 28 in both engines) and ISO day-of-week/week-of-year."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.last_day("o_orderdate").alias("month_end"),
        F.add_months("o_orderdate", 3).alias("plus3m"),
        F.date_sub(F.col("o_orderdate").cast("date"), 7).alias("minus7d"),
        F.quarter("o_orderdate").cast("long").alias("qtr"),
        F.weekofyear("o_orderdate").cast("long").alias("woy"),
        F.dayofyear("o_orderdate").cast("long").alias("doy"),
        (F.weekday("o_orderdate") + 1).cast("long").alias("dow_iso"),
    )


@register(
    "q_minmax_scale",
    oracle="""
SELECT o_orderkey, o_orderpriority,
       round((o_totalprice - min(o_totalprice) OVER (PARTITION BY o_orderpriority))
             / (max(o_totalprice) OVER (PARTITION BY o_orderpriority)
                - min(o_totalprice) OVER (PARTITION BY o_orderpriority)), 4) AS scaled
FROM orders
""",
)
def q_minmax_scale(spark, sf_dir):
    """Grouped-map applyInPandas (vectorized per-group transform):
    min-max scale order totals within each priority group. Min/max are
    exact, so the pandas path hash-matches a pure-SQL window oracle —
    demonstrating that Arrow-batched Python transforms can still be
    oracle-verified. At scale each group processes as one-or-more Arrow
    batches on its own executor partition."""
    o = table(spark, sf_dir, "orders")

    def scale(pdf: pd.DataFrame) -> pd.DataFrame:
        lo, hi = pdf["o_totalprice"].min(), pdf["o_totalprice"].max()
        return pd.DataFrame(
            {
                "o_orderkey": pdf["o_orderkey"],
                "o_orderpriority": pdf["o_orderpriority"],
                "scaled": ((pdf["o_totalprice"] - lo) / (hi - lo)).round(4),
            }
        )

    return o.groupBy("o_orderpriority").applyInPandas(
        scale, "o_orderkey long, o_orderpriority string, scaled double"
    )


@register(
    "q_stream_stateful_count",
    oracle="""
SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id
""",
)
def q_stream_stateful_count(spark, sf_dir):
    """Custom stateful streaming operator (applyInPandasWithState):
    per-user running event count kept in explicit state — the escape
    hatch for stateful logic Spark's built-ins can't express. State is
    per-key and distributed; output here is one row per key per batch."""

    def update(key, pdfs, state: GroupState):
        total = state.get[0] if state.exists else 0
        for pdf in pdfs:
            total += len(pdf)
        state.update((total,))
        yield pd.DataFrame({"user_id": [key[0]], "cnt": [total]})

    s = events_stream(spark, sf_dir)
    counted = s.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, cnt long",
        stateStructType="cnt long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return run_to_memory(counted, output_mode="update")


@register(
    "q_udaf_weighted_mean",
    oracle="""
SELECT l_returnflag,
       round(sum(l_quantity * l_linenumber) / sum(l_linenumber), 4)
         AS wmean_qty,
       count(*) AS cnt
FROM lineitem
GROUP BY l_returnflag
""",
)
def q_udaf_weighted_mean(spark, sf_dir):
    """Custom UDAF via a grouped-agg pandas UDF — the third leg of the
    UDF/UDAF/UDTF surface (SURVEY §2.2). Weighted mean of quantity by
    line number: both inputs are integral, so the float sums are exact
    and order-independent, keeping the oracle hash engine-portable.
    At scale this is one Arrow batch per group partition — no per-row
    Python — though built-in sum()/count() composition stays the
    preferred shape when the algebra allows it."""

    @F.pandas_udf("double")
    def wmean(q: pd.Series, w: pd.Series) -> float:
        return float((q * w).sum() / w.sum())

    # grouped-agg pandas UDFs can't mix with JVM aggregates in one
    # agg(), so the row count is a second pandas aggregate
    @F.pandas_udf("long")
    def pcount(q: pd.Series) -> int:
        return len(q)

    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(wmean("l_quantity", "l_linenumber"), 4).alias("wmean_qty"),
            pcount("l_quantity").alias("cnt"),
        )
    )


@register(
    "q_map_funcs",
    oracle="""
SELECT event_id,
       'k,type' AS keys_csv,
       event_type AS type_val,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
       upper(event_type) AS type_upper,
       CAST(3 AS BIGINT) AS n_after_concat,
       CAST(1 AS BIGINT) AS has_type
FROM events
""",
)
def q_map_funcs(spark, sf_dir):
    """MapType function surface: create_map, map_keys, element_at,
    transform_values (higher-order over map entries), map_concat,
    map_contains_key — all JVM-side codegen'd expressions; the DuckDB
    oracle computes the same projection from the flat columns."""
    e = table(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("type"), F.col("event_type"),
        F.lit("k"), F.get_json_object("props", "$.k"),
    )
    m2 = F.transform_values(m, lambda _, v: F.upper(v))
    mc = F.map_concat(m, F.create_map(F.lit("extra"), F.col("event_id").cast("string")))
    return e.select(
        "event_id",
        F.array_join(F.sort_array(F.map_keys(m)), ",").alias("keys_csv"),
        F.element_at(m, "type").alias("type_val"),
        F.element_at(m, "k").cast("long").alias("k_val"),
        F.element_at(m2, "type").alias("type_upper"),
        F.size(mc).cast("long").alias("n_after_concat"),
        F.map_contains_key(m, "type").cast("long").alias("has_type"),
    )


@register(
    "q_bitwise_funcs",
    oracle="""
SELECT event_id,
       event_id & 255 AS b_and,
       event_id | 4096 AS b_or,
       xor(event_id, user_id) AS b_xor,
       (event_id & 1023) << 3 AS b_shl,
       event_id >> 2 AS b_shr,
       CAST(bit_count(CAST(event_id AS BIGINT)) AS BIGINT) AS b_cnt
FROM events
""",
)
def q_bitwise_funcs(spark, sf_dir):
    """Bitwise scalar family (&, |, xor, shifts, popcount) — the
    integer-kernel toolbox the Z-order/SimHash/banding operators are
    built from, pinned as its own contract. Pure codegen projections,
    zero shuffle."""
    e = table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.col("event_id").bitwiseAND(F.lit(255)).alias("b_and"),
        F.col("event_id").bitwiseOR(F.lit(4096)).alias("b_or"),
        F.col("event_id").bitwiseXOR(F.col("user_id")).alias("b_xor"),
        F.shiftleft(F.col("event_id").bitwiseAND(F.lit(1023)), 3).cast("long").alias("b_shl"),
        F.shiftright(F.col("event_id"), 2).cast("long").alias("b_shr"),
        F.bit_count("event_id").cast("long").alias("b_cnt"),
    )


@register(
    "q_hash_funcs",
    oracle="""
SELECT doc_id,
       md5(text) AS h_md5,
       sha256(text) AS h_sha256,
       md5(text || ':' || CAST(doc_id AS VARCHAR)) AS h_salted
FROM documents
""",
)
def q_hash_funcs(spark, sf_dir):
    """Cryptographic digest family (md5 / sha-256 / salted digest) —
    the content-addressing primitives under exact dedup, incremental
    admission, and split assignment, pinned byte-for-byte against the
    oracle's implementations. Narrow projection, zero shuffle."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("h_md5"),
        F.sha2("text", 256).alias("h_sha256"),
        F.md5(F.concat("text", F.lit(":"), F.col("doc_id").cast("string"))).alias(
            "h_salted"
        ),
    )
