"""Table layout for scan efficiency: clustered (range-partitioned,
sorted) writes that make file-stats data skipping effective.

Data skipping (sources/delta_log.py) can only prune files whose min/max
ranges are narrow. A shuffle-random layout gives every file the full
value range — zero skipping. ``write_clustered`` range-partitions on
the cluster key and sorts within partitions before writing, so each
file covers a disjoint slice; range predicates then touch
O(selectivity) of the files. This is the single biggest scan lever at
100 TB (the Z-order/liquid-clustering idea, 1-D case).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from pulsar_io_delta_spark.sources.delta_log import DeltaTable


def write_clustered(
    table: DeltaTable,
    df: DataFrame,
    cluster_col: str,
    num_files: int = 16,
    mode: str = "append",
) -> int:
    """Commit ``df`` laid out as ``num_files`` files with disjoint
    ``cluster_col`` ranges (each file's footer min/max is tight)."""
    clustered = df.repartitionByRange(num_files, cluster_col).sortWithinPartitions(
        cluster_col
    )
    return table.write(clustered, mode=mode)


def skipping_ratio(table: DeltaTable, filters: list[tuple[str, str, object]]) -> float:
    """Fraction of files a filtered read would skip (1.0 = all skipped)."""
    snap = table.snapshot()
    if not snap.files:
        return 0.0
    kept = table.prune_files(snap, filters)
    return 1.0 - len(kept) / len(snap.files)
