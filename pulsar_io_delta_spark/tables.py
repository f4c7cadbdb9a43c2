"""Loaders for the driver-generated parquet fixtures (TESTDATA.md).

All queries read through :func:`table` so timestamp semantics are
uniform: ``events.ts`` is physically TIMESTAMP(NANOS) parquet, which
Spark 4 cannot read natively — we read it as a nanosecond long
(``spark.sql.legacy.parquet.nanosAsLong``) and convert with integer
division to a microsecond timestamp (``timestamp_micros(ts div 1000)``;
double division would lose precision at 1.7e18 ns). DuckDB's own read of
the same file truncates ns→µs identically, so oracles agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    pin_session(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLE_NAMES}
