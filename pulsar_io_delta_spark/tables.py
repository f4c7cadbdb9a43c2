"""Loaders for the driver-generated parquet fixtures (TESTDATA.md).

All queries read through :func:`table` so timestamp semantics are
uniform. The driver has regenerated ``events.parquet`` with different
physical encodings across rounds (TIMESTAMP(NANOS) in rounds 1-3,
``timestamp[us]`` from round 4's regeneration), so the loader
dispatches on the *observed* Spark type of ``ts`` instead of assuming
one encoding:

- ``LongType``  — the file is TIMESTAMP(NANOS) read under
  ``spark.sql.legacy.parquet.nanosAsLong`` (session.py keeps the flag
  on so a NANOS file loads as a long instead of failing); convert with
  integer division ``timestamp_micros(ts div 1000)`` (double division
  would lose precision at 1.7e18 ns). DuckDB truncates ns→µs
  identically, so oracles agree.
- ``TimestampNTZType`` — plain ``timestamp[us]`` without timezone
  metadata; the session is pinned UTC, so ``cast("timestamp")`` is a
  pure relabel (no instant shift).
- ``TimestampType`` — already what every query expects; passthrough.

Any other type fails loudly: silent mis-conversion here produced
wrong-answer streams in round 4 (VERDICT.md "What's wrong" #2).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DataType, LongType, TimestampNTZType, TimestampType

from pulsar_io_delta_spark.session import pin_session

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def ts_to_timestamp(dtype: DataType, name: str = "ts") -> Column:
    """Normalize an ``events.ts``-style column of observed type *dtype*
    to TIMESTAMP (UTC session). See module docstring for the encodings.

    Takes the column *name* (not a Column) because the ns-long path
    needs SQL integer division (``div``): ``(col / 1000).cast("long")``
    routes through double, which cannot represent 1.7e18 exactly.
    """
    if isinstance(dtype, LongType):
        return F.expr(f"timestamp_micros({name} div 1000)")
    if isinstance(dtype, TimestampNTZType):
        return F.col(name).cast(TimestampType())
    if isinstance(dtype, TimestampType):
        return F.col(name)
    raise TypeError(
        f"column {name!r} has unsupported physical type {dtype}; expected "
        "a nanosecond long (nanosAsLong), timestamp_ntz, or timestamp"
    )


# Event-time columns per fixture table: every one is normalized to
# TIMESTAMP by observed physical type, so a future driver regeneration
# that flips the encoding (as events.ts did in round 4: ns → µs) cannot
# break or silently corrupt queries on ANY table. DuckDB oracles read
# the same files and land on the same µs instants (ns truncates
# identically), so both sides stay in lockstep whatever the encoding.
TS_COLUMNS: dict[str, tuple[str, ...]] = {
    "events": ("ts",),
    "lineitem": ("l_shipdate",),
    "orders": ("o_orderdate",),
}


def normalize_ts_columns(df: DataFrame, cols: tuple[str, ...]) -> DataFrame:
    for c in cols:
        if c not in df.columns:
            continue
        dtype = df.schema[c].dataType
        if not isinstance(dtype, TimestampType):
            df = df.withColumn(c, ts_to_timestamp(dtype, c))
    return df


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """Schema-dispatch ``ts`` to a proper TIMESTAMP column."""
    return normalize_ts_columns(df, ("ts",))


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    pin_session(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    cols = TS_COLUMNS.get(name)
    if cols:
        df = normalize_ts_columns(df, cols)
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLE_NAMES}
