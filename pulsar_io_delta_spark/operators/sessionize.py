"""Batch gap-based sessionization + funnel analysis over event streams.

The streaming surface already has session windows
(`queries/streaming_queries.py` q_stream_session via
``F.session_window``); this module is the *batch* equivalent a
training-data / analytics pipeline runs over historical logs: assign a
session id to every event (new session when the gap to the previous
event of the same user exceeds a threshold), then aggregate per
session. Reference parity: the reference connector has no sessionizer —
this belongs to the beyond-reference pipeline surface (SURVEY §2.2).

Scale shape (100 TB): ONE shuffle on the user key. The lag-window, the
running-sum window, and the final per-session aggregation all share the
``user_id`` partitioning, so Catalyst plans a single Exchange followed
by in-partition sorts — the same shape DuckDB/Snowflake use for
sessionization. Skewed users (bots) are bounded: windows are
per-partition streams, not materialized groups, and the final agg is
partial-aggregated map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Add a per-user ``session_seq`` (1-based) to every event row.

    A new session starts when the event is the user's first or arrives
    more than ``gap_seconds`` after the previous event (exact µs
    integer comparison — no float time math).
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, order_tiebreak)
    us = F.unix_micros(F.col(ts_col))
    brk = F.when(
        F.lag(us).over(w).isNull()
        | (us - F.lag(us).over(w) > F.lit(gap_seconds) * 1_000_000),
        F.lit(1),
    ).otherwise(F.lit(0))
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        df.withColumn("_brk", brk)
        .withColumn("session_seq", F.sum("_brk").over(run).cast("long"))
        .drop("_brk")
    )


def session_stats(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Per-session aggregate: event count + start/end as epoch seconds."""
    s = sessionize(df, user_col=user_col, ts_col=ts_col, gap_seconds=gap_seconds)
    return s.groupBy(user_col, "session_seq").agg(
        F.count("*").cast("long").alias("n_events"),
        F.unix_timestamp(F.min(ts_col)).cast("long").alias("start_s"),
        F.unix_timestamp(F.max(ts_col)).cast("long").alias("end_s"),
    )


def funnel_counts(
    df: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered-funnel user counts: stage k counts users with an event of
    ``stages[k]`` strictly after their stage-(k-1) entry time.

    One shuffle total: every stage-entry time is a conditional
    ``min(when(...)) over (partition by user)`` on the SAME window key,
    so Catalyst plans one Exchange and chains the Window operators
    in-partition; the final count is a tiny aggregation over one row
    per user.
    """
    w = Window.partitionBy(user_col)
    out = df
    prev: str | None = None
    for i, stage in enumerate(stages):
        cond = F.col(type_col) == stage
        if prev is not None:
            cond = cond & (F.col(ts_col) > F.col(prev))
        col = f"_t{i}"
        out = out.withColumn(col, F.min(F.when(cond, F.col(ts_col))).over(w))
        prev = col
    # One row per user WITHOUT a new exchange: the windows left the data
    # hash-partitioned on user_col, and groupBy(user_col) reuses that
    # partitioning (a .distinct() over (user, _t0.._tk) would shuffle
    # again on the full tuple). Every row of a user carries identical
    # _t columns, so max() just picks the value.
    per_user = out.groupBy(user_col).agg(
        *[F.max(f"_t{i}").alias(f"_t{i}") for i in range(len(stages))]
    )
    aggs = [F.count(f"_t{i}").cast("long").alias(f"_n{i}") for i in range(len(stages))]
    wide = per_user.agg(*aggs)
    # Wide → long via explode(array(struct(...))): stage labels travel as
    # lit() values and counts by positional column name, so arbitrary
    # stage strings (quotes, dots, SQL metachars) can't corrupt a
    # generated expression — the earlier stack() SQL string interpolated
    # the labels into F.expr.
    pairs = F.array(
        *[
            F.struct(F.lit(stage).alias("stage"), F.col(f"_n{i}").alias("n_users"))
            for i, stage in enumerate(stages)
        ]
    )
    return wide.select(F.explode(pairs).alias("p")).select(
        F.col("p.stage").alias("stage"),
        F.col("p.n_users").cast("long").alias("n_users"),
    )
