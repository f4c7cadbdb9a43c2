"""Scale-path join strategies: salted joins for skew, bucketed layout
for shuffle-free co-located joins.

These don't change join *semantics* (tests assert equality with the
plain join); they change the physical shape:

- **Salting** splits a hot key across ``salt`` sub-keys: the skewed
  side gets a random salt in [0, salt), the other side is replicated
  ``salt`` times with every salt value. The shuffle then spreads a hot
  key over ``salt`` reducers. AQE's skew-join handles moderate skew
  automatically; explicit salting is the knob for degenerate keys
  (one key = 30% of 100 TB).
- **Bucketing** pre-shuffles both tables into the same bucket layout at
  write time, so every subsequent equi-join/aggregation on the bucket
  key is exchange-free. This is the 100 TB answer to repeated
  lineitem⋈orders joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    key: str,
    other_key: str | None = None,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join robust to a skewed key distribution on ``skewed``.

    Result columns = skewed's columns + other's columns (salt columns
    dropped), identical to ``skewed.join(other, key)``.

    Only probe-side-preserving modes are allowed: replicating the build
    side ``salt`` times would emit ``salt`` copies of every unmatched
    build row under right/full outer semantics.
    """
    if how not in {"inner", "left", "left_semi", "left_anti", "leftsemi", "leftanti"}:
        raise ValueError(
            f"salted_join supports inner/left/left_semi/left_anti, not {how!r}: "
            "the replicated build side would duplicate unmatched rows"
        )
    other_key = other_key or key
    s = skewed.withColumn("_salt_l", (F.rand(seed=42) * salt).cast("int"))
    # replicate the build side once per salt value
    o = other.select("*", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))).alias("_salt_r"))
    if other_key == key:
        o = o.withColumnRenamed(key, "_rkey")
        right_key = "_rkey"
    else:
        right_key = other_key
    joined = s.join(
        o, (s[key] == o[right_key]) & (s["_salt_l"] == o["_salt_r"]), how
    )
    drop = ["_salt_l", "_salt_r"] + (["_rkey"] if right_key == "_rkey" else [])
    return joined.drop(*drop)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
) -> DataFrame:
    """As-of join (an operator Spark lacks natively): for each left row,
    the most recent right row with ``right_ts <= left_ts`` per key.

    Implemented as the scalable merge shape — tagged union, one sort
    per key partition, last-value carry-forward — instead of an
    inequality join (which Spark would execute as a per-key cross
    product). Cost is one shuffle on the key + one within-partition
    sort, identical asymptotics to a sort-merge join. Left semantics:
    left rows with no prior right row keep nulls.

    Matches native ASOF JOIN edge semantics: null join keys never match
    (those left rows pass through with null right columns), and the
    carried match is one whole right row — a single struct — so a right
    row's legitimately-NULL column can never be stitched together with a
    value from an older right row.
    """
    rstruct = F.struct(*[F.col(c) for c in right_cols]).alias("_r")
    rstruct_type = right.select(rstruct).schema["_r"].dataType

    l_tagged = (
        left.where(F.col(on).isNotNull())
        .withColumn("_ts", F.col(left_ts))
        .withColumn("_side", F.lit(1))
        .withColumn("_r", F.lit(None).cast(rstruct_type))
    )
    r_tagged = right.where(F.col(on).isNotNull()).select(
        F.col(on),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        rstruct,
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
            if c != on
        ],
    )
    unioned = l_tagged.unionByName(r_tagged.select(*l_tagged.columns))
    # right rows sort before left rows at equal ts → "<=" semantics;
    # a null left ts sorts first → carries no match, like the native op
    w = (
        Window.partitionBy(on)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select("*", F.last("_r", ignorenulls=True).over(w).alias("_m"))
    matched = carried.where(F.col("_side") == 1).select(
        *left.columns, *[F.col("_m")[c].alias(c) for c in right_cols]
    )
    passthrough = left.where(F.col(on).isNull()).select(
        *left.columns,
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in right_cols],
    )
    return matched.unionByName(passthrough)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_key: str,
    num_buckets: int = 16,
    sort_by: str | None = None,
) -> None:
    """Persist a table bucketed (and optionally sorted) by the join key.

    Requires a session with a warehouse (enableHiveSupport not needed;
    the in-memory catalog + spark-warehouse dir suffices locally).
    """
    writer = df.write.mode("overwrite").bucketBy(num_buckets, bucket_key)
    if sort_by:
        writer = writer.sortBy(sort_by)
    writer.saveAsTable(table_name)


def bucketed_join_is_shuffle_free(spark: SparkSession, left: str, right: str, key: str) -> bool:
    """True iff joining the two bucketed tables on ``key`` plans without
    an Exchange (the point of bucketing). Broadcast is disabled for the
    check — at fixture scale the planner would rather broadcast than use
    the buckets; at 100 TB neither side broadcasts and the bucketed
    SortMergeJoin is the plan that matters."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = spark.table(left).join(spark.table(right), key)
        plan = df._jdf.queryExecution().executedPlan().toString()
        return "Exchange" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
