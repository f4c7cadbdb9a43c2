"""Semantics + plan-shape guards for the round-5 batch session/funnel
operators (operators/sessionize.py) and the embedding column ops."""

import datetime

import pyspark.sql.functions as F

from pulsar_io_delta_spark.operators.sessionize import (
    funnel_counts,
    session_stats,
    sessionize,
)


def _events(spark, rows):
    base = datetime.datetime(2024, 1, 1)
    return spark.createDataFrame(
        [
            (i, base + datetime.timedelta(seconds=sec), uid, typ)
            for i, (uid, sec, typ) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string",
    )


def test_sessionize_splits_on_gap(spark):
    # user 1: events at t=0s, 10s, then 2000s later → two sessions
    df = _events(spark, [(1, 0, "a"), (1, 10, "a"), (1, 2010, "a"), (2, 5, "a")])
    got = {
        (r.user_id, r.event_id): r.session_seq
        for r in sessionize(df, gap_seconds=1800).collect()
    }
    assert got == {(1, 0): 1, (1, 1): 1, (1, 2): 2, (2, 3): 1}


def test_session_stats_bounds(spark):
    df = _events(spark, [(1, 0, "a"), (1, 10, "a"), (1, 2010, "a")])
    rows = {r.session_seq: r for r in session_stats(df).collect()}
    assert rows[1].n_events == 2 and rows[2].n_events == 1
    assert rows[1].end_s - rows[1].start_s == 10
    assert rows[2].start_s - rows[1].start_s == 2010


def test_sessionize_single_exchange(spark):
    """Lag window, running sum, and per-session agg must share ONE
    exchange on the user key — the 100 TB contract."""
    df = _events(spark, [(1, 0, "a"), (1, 10, "a")])
    plan = session_stats(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


def test_funnel_strict_ordering(spark):
    # user 1 completes the funnel in order; user 2 clicks BEFORE viewing
    # (click must not count); user 3 only views.
    df = _events(
        spark,
        [
            (1, 0, "view"), (1, 10, "click"), (1, 20, "purchase"),
            (2, 0, "click"), (2, 10, "view"),
            (3, 0, "view"),
        ],
    )
    got = {r.stage: r.n_users for r in funnel_counts(df, ["view", "click", "purchase"]).collect()}
    assert got == {"view": 3, "click": 1, "purchase": 1}


def test_funnel_same_timestamp_not_counted(spark):
    # strictly-after semantics: click at the same instant as the view
    df = _events(spark, [(1, 0, "view"), (1, 0, "click")])
    got = {r.stage: r.n_users for r in funnel_counts(df, ["view", "click"]).collect()}
    assert got == {"view": 1, "click": 0}


def test_funnel_no_self_join(spark):
    """The funnel is conditional window-mins over ONE scan: the plan
    must contain no join operator (the naive formulation scans events
    once per stage and joins)."""
    df = _events(spark, [(1, 0, "view"), (1, 10, "click")])
    plan = (
        funnel_counts(df, ["view", "click"])._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan, plan


def test_entropy_known_values(spark):
    from pulsar_io_delta_spark.operators.text import with_char_entropy

    df = spark.createDataFrame(
        [(0, "aaaa"), (1, "abab"), (2, "abcd"), (3, ""), (4, "x")], ["i", "t"]
    )
    got = [
        r.entropy
        for r in with_char_entropy(df, text_col="t").orderBy("i").collect()
    ]
    assert got == [0.0, 0.6931, 1.3863, 0.0, 0.0]  # 0, ln2, ln4, empty, single


def test_quantize_range_and_sign(spark, sf_dir):
    from pulsar_io_delta_spark.queries.pipeline2 import q_emb_quantize

    rows = q_emb_quantize(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert -127 <= r.q_min <= r.q_max <= 127
        assert r.amax >= 0


def test_chunk_docs_zero_shuffle(spark, sf_dir):
    """Chunking is tokenize + stride-explode + slice: pure narrow map,
    no exchange anywhere."""
    from pulsar_io_delta_spark.queries.pipeline2 import q_chunk_docs

    plan = q_chunk_docs(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_tfidf_single_corpus_aggregation(spark, sf_dir):
    """100 TB contract for q_tfidf_topterms (round-6 rewrite):

    (a) NO count-window over the token partition — windows do no
        map-side partial aggregation, so a stopword's (doc,token) rows
        all land on ONE reducer at corpus scale;
    (b) document frequency = groupBy(token) on the persisted tf,
        joined back BROADCAST — the df exchange is vocab-sized;
    (c) the corpus-sized (doc,token) aggregation materializes exactly
        once: both the tf branch and the df branch read the SAME
        InMemoryRelation (two InMemoryTableScans);
    (d) n_docs is folded into the plan as a zero-column count scan,
        not an eager driver-side d.count()."""
    from pulsar_io_delta_spark.queries.pipeline2 import q_tfidf_topterms

    plan = (
        q_tfidf_topterms(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    )
    assert "windowspecdefinition(token" not in plan, plan
    assert plan.count("InMemoryTableScan") == 2, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "ReadSchema: struct<>" in plan, plan


def test_quantize_transforms_evaluated_once(spark, sf_dir):
    """amax/qv must stay materialized named columns: re-inlining the
    interpreted higher-order expressions (amax per lambda element, qv
    per consumer) measured 4.3× slower. Exactly two transform() calls
    may appear in the executed plan."""
    from pulsar_io_delta_spark.queries.pipeline2 import q_emb_quantize

    plan = (
        q_emb_quantize(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("transform(") == 2, plan


def test_sessionize_matches_python_reference_on_random_stream(spark):
    """Seeded random event stream (duplicate timestamps, singleton and
    bot-heavy users) vs a brute-force Python sessionizer — exact match
    of every (user, session) aggregate."""
    import random

    rng = random.Random(42)
    base = datetime.datetime(2024, 3, 1)
    rows = []
    eid = 0
    for uid in range(25):
        t = 0
        for _ in range(rng.choice([1, 2, 5, 40])):
            t += rng.choice([1, 30, 1799, 1800, 1801, 7200])
            rows.append((eid, base + datetime.timedelta(seconds=t), uid, "e"))
            eid += 1
    # duplicate-timestamp pairs exercise the event_id tiebreak
    rows.append((eid, base + datetime.timedelta(seconds=10), 99, "e"))
    rows.append((eid + 1, base + datetime.timedelta(seconds=10), 99, "e"))

    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    got = {
        (r.user_id, r.session_seq): (r.n_events, r.start_s, r.end_s)
        for r in session_stats(df, gap_seconds=1800).collect()
    }

    # Python reference: sort by (user, ts, event_id), split on gap > 1800s
    want = {}
    by_user = {}
    for e, ts, u, _t in sorted(rows, key=lambda r: (r[2], r[1], r[0])):
        by_user.setdefault(u, []).append(ts)
    for u, tss in by_user.items():
        seq, prev = 0, None
        for ts in tss:
            if prev is None or (ts - prev).total_seconds() > 1800:
                seq += 1
                want[(u, seq)] = [0, ts, ts]
            want[(u, seq)][0] += 1
            want[(u, seq)][2] = ts
            prev = ts
    want = {
        k: (n, int(a.replace(tzinfo=datetime.timezone.utc).timestamp()),
            int(b.replace(tzinfo=datetime.timezone.utc).timestamp()))
        for k, (n, a, b) in want.items()
    }
    assert got == want


def test_chunk_boundaries_exact(spark):
    """90 tokens, window 50, stride 40 → chunks at 1/41/81 with sizes
    50/50/10 and exact overlap content."""
    from pulsar_io_delta_spark.queries import pipeline2

    toks = [f"t{i}" for i in range(1, 91)]
    df = spark.createDataFrame([(7, " ".join(toks))], ["doc_id", "text"])

    # drive the registered query over an in-memory frame by patching the
    # loader name pipeline2 resolved at import time
    orig = pipeline2.table
    try:
        pipeline2.table = lambda _s, _d, name: df
        out = {r.start: r for r in pipeline2.q_chunk_docs(spark, "ignored").collect()}
    finally:
        pipeline2.table = orig

    assert sorted(out) == [1, 41, 81]
    assert [out[s].n_tok for s in (1, 41, 81)] == [50, 50, 10]
    assert out[1].chunk.split(" ") == toks[0:50]
    assert out[41].chunk.split(" ") == toks[40:90]
    assert out[81].chunk.split(" ") == toks[80:90]


def test_funnel_stage_names_with_metachars(spark):
    """Stage labels are data, not SQL: quotes/dots/parens in a stage
    name must survive to the output untouched (the pre-r6 stack()
    string interpolation broke the expr parse)."""
    df = _events(spark, [(1, 0, "o'view"), (1, 10, "cl.ick, (x)")])
    got = {
        r.stage: r.n_users
        for r in funnel_counts(df, ["o'view", "cl.ick, (x)"]).collect()
    }
    assert got == {"o'view": 1, "cl.ick, (x)": 1}


def test_run_length_counts_empty_array(spark):
    """Empty input → empty counts (not [null]): the ends expression is
    guarded the same way as starts."""
    from pulsar_io_delta_spark.operators.text import with_run_length_counts

    df = spark.createDataFrame([(0, []), (1, ["a", "a", "b"])], "i long, arr array<string>")
    out, col = with_run_length_counts(df, F.col("arr"))
    rows = {r.i: r[col] for r in out.collect()}
    assert rows[0] == []
    assert sorted(rows[1]) == [1, 2]


def test_dsum_decimal_exact_rounding(spark):
    """dsum must round per-row exactly like the oracle's decimal cast:
    0.145 → 0.15 (shortest-repr HALF_UP), not round(0.145·100)=14.
    ADVICE round-5: sum([0.145, 0.135, 1.005, 2.675]) at (18,2) is
    3.98 on the decimal path; the old binary-product path gave 3.96."""
    from pulsar_io_delta_spark.queries._util import dsum

    df = spark.createDataFrame(
        [(0.145,), (0.135,), (1.005,), (2.675,)], "x double"
    )
    got = df.agg(dsum("x", "18,2").alias("s")).first().s
    assert got == 3.98, got


def test_dsum_scale_above_bound_uses_decimal_path(spark):
    """scale > 6 voids the scaled-long overflow headroom bound — dsum
    must fall back to the exact decimal aggregate (never a wrapped
    long). The plan shows a decimal sum, and the value is exact."""
    from pulsar_io_delta_spark.queries._util import dsum

    df = spark.createDataFrame([(0.12345678,), (0.87654322,)], "x double")
    agg = df.agg(dsum("x", "24,8").alias("s"))
    plan = agg._jdf.queryExecution().optimizedPlan().toString()
    assert "decimal(24,8)" in plan, plan  # decimal aggregate, not scaled-long
    assert agg.first().s == 1.0


def test_time_rollup_reuses_hourly_stage(spark, sf_dir):
    """The continuous-aggregate cascade contract: after execution, the
    final adaptive plan must show the day level consuming the hourly
    aggregation through a ReusedExchange — ONE corpus aggregation
    feeding both resolutions."""
    from pulsar_io_delta_spark.queries.pipeline2 import q_time_rollup_multires

    df = q_time_rollup_multires(spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan, plan[:500]
    assert "ReusedExchange" in plan, plan
