"""Structured Streaming execution helpers.

The reference's runtime loop (reader thread → blocking queue →
``Source.read()``, `DeltaReaderThread.java:48-73`,
`DeltaLakeConnectorSource.java:97-112`) maps to Spark's micro-batch
engine; these helpers give the engine a uniform way to

- build a file-based stream over a driver fixture (Spark's file source
  requires a *directory*, so we symlink the fixture file into a temp
  dir — zero-copy),
- run a streaming DataFrame to completion with ``Trigger.AvailableNow``
  into a memory sink and hand back the result as a normal DataFrame
  (used by the declared ``q_stream_*`` queries so they execute through
  the real streaming engine, not a batch rewrite).

Scale notes: availableNow + memory sink is the *test* harness; the
production path is ``writeStream.foreachBatch`` into the Delta-log sink
(sources/delta_log.py) with a checkpointLocation, which is the idiomatic
replacement for the reference's per-partition state-store checkpoints
(`DeltaLakeConnectorSource.java:119-187`).
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from pulsar_io_delta_spark.session import pin_session

# events.parquet physical schema under nanosAsLong: ts is a nanosecond long.
EVENTS_RAW_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def stream_dir_for(sf_dir: str, name: str) -> str:
    """File-source-compatible directory containing a symlink to the fixture.

    Deterministic per (sf_dir, name): checkpointed restarts must resolve
    the *same* source path, so a fresh random dir per call would break
    recovery (offsets store absolute file paths).
    """
    import hashlib

    key = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:10]
    d = os.path.join(tempfile.gettempdir(), f"pids_stream_{name}_{key}")
    os.makedirs(d, exist_ok=True)
    link = os.path.join(d, f"{name}.parquet")
    if not os.path.exists(link):
        os.symlink(os.path.join(sf_dir, f"{name}.parquet"), link)
    return d


def events_stream(spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None) -> DataFrame:
    """Streaming view of the events fixture with `ts` as a proper timestamp."""
    pin_session(spark)
    reader = spark.readStream.schema(EVENTS_RAW_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = reader.parquet(stream_dir_for(sf_dir, "events"))
    return raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))


def run_to_memory(
    streaming_df: DataFrame,
    output_mode: str,
    timeout_s: int = 300,
) -> DataFrame:
    """Execute a streaming DataFrame with Trigger.AvailableNow into a
    uniquely-named memory sink; return the sink contents as a DataFrame."""
    name = f"pids_sink_{uuid.uuid4().hex[:12]}"
    query = (
        streaming_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    try:
        if not query.awaitTermination(timeout_s):
            raise TimeoutError(f"streaming query {name} did not finish in {timeout_s}s")
    finally:
        if query.isActive:
            query.stop()
    spark = streaming_df.sparkSession
    return spark.table(name)
