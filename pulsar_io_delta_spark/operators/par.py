"""Parallelism guard for amplification-heavy narrow stages.

A stage downstream of an explode / Python codec does 10-100x the work
per input byte, so scan partitioning sized for RAW bytes
(``spark.sql.files.maxPartitionBytes``) under-parallelizes it: the
local single-file fixture scans as ONE partition and serializes every
core behind it. ``fan_out`` shuffles the PRE-amplification rows (the
cheap side) up to the cluster's parallelism; on a well-split 100 TB
input it is a no-op, so production plans keep their shuffle count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Repartition ``df`` to the cluster's default parallelism iff its
    current partitioning is narrower; ``cols`` optionally keys the
    shuffle (co-location for a downstream per-key stage)."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target, *cols) if cols else df.repartition(target)
