"""CDC envelope + canonical partition-value encoding + hash routing.

Rebuilds the reference's record envelope (SURVEY §1.4) as ordinary
DataFrame columns:

- ``op``: 'c' (insert / AddFile), 'r' (delete / RemoveFile),
  'm' (schema change / Metadata) — reference ``DeltaRecord.java:60-99``.
- ``partition_value``: TreeMap-sorted ``k=v`` concatenation with **no
  separator between pairs** — the reference's quirk is preserved
  byte-for-byte (``DeltaReader.java:290-299``).
- ``ts``: event time (file modification / deletion timestamp);
  ``capture_ts`` (processing time) exists as an optional column but is
  excluded from verified outputs (non-deterministic).
- routing: murmur3-seed-0 slot id (``DeltaReader.java:60-63``).

All transforms are narrow (no shuffle); routing a 100 TB stream is a
single `repartition(n, slot)` exchange at the sink boundary.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


OP_INSERT = "c"
OP_DELETE = "r"
OP_METADATA = "m"


def partition_value_expr(partition_cols: dict[str, Column]) -> Column:
    """Canonical partition-value string: keys sorted, ``k=v`` pairs
    concatenated with no separator (reference `DeltaReader.java:290-299`).

    A NULL partition value encodes as the literal ``null`` — the
    StringBuilder.append behavior of the reference — rather than
    nulling the whole string (F.concat is null-propagating)."""
    pieces: list[Column] = []
    for key in sorted(partition_cols):
        pieces.append(F.lit(f"{key}="))
        pieces.append(F.coalesce(partition_cols[key].cast("string"), F.lit("null")))
    return F.concat(*pieces)


def cdc_envelope(
    df: DataFrame,
    op: str,
    partition_cols: dict[str, Column],
    event_time: Column | None = None,
    with_capture_ts: bool = False,
) -> DataFrame:
    """Attach the CDC envelope columns to a batch of rows."""
    out = df.withColumn("op", F.lit(op)).withColumn(
        "partition_value", partition_value_expr(partition_cols)
    )
    if event_time is not None:
        out = out.withColumn("ts", event_time)
    if with_capture_ts:
        out = out.withColumn("capture_ts", F.current_timestamp())
    return out


def route(df: DataFrame, num_partitions: int, value_col: str = "partition_value") -> DataFrame:
    """Add the reference-parity routing slot and co-locate rows by it.
    Partition values are low-cardinality, so the slot comes from a
    hash-the-distincts broadcast join (JVM-side per-row path)."""
    from pulsar_io_delta_spark.functions.murmur3 import with_route_lowcard

    routed = with_route_lowcard(df, F.col(value_col), num_partitions)
    return routed.repartition(num_partitions, "partition_id")
