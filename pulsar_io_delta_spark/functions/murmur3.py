"""Murmur3 x86 32-bit, seed 0, over UTF-8 bytes — routing-parity hash.

The reference routes records to topic partitions with
``Murmur3_32Hash(partition_value_string) & MAX_INT % numPartitions``
(reference ``DeltaReader.java:60-63``; vendored algorithm
``Murmur32Hash.java:29-99``). Spark's built-in ``hash()`` is murmur3
with seed 42 over typed values, so byte-exact parity needs this
implementation. It is used only where slot-number parity matters
(``q_hash_route``, CDC routing demos); internal repartitioning uses
plain ``repartition(n, col)`` which is already murmur3-based.

Scale note: the pandas UDF receives Arrow batches; the per-row Python
loop is the cost of exact parity. On a real 100 TB pipeline routing
parity with Pulsar's hash is only needed at the final sink stage, after
all heavy relational work, and is embarrassingly parallel.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def murmur3_32(data: bytes, seed: int = 0) -> int:
    """Pure-python murmurhash3_x86_32 (public-domain algorithm)."""
    c1, c2 = 0xCC9E2D51, 0x1B873593
    h = seed & 0xFFFFFFFF
    length = len(data)
    rounded = length & ~0x3
    for i in range(0, rounded, 4):
        k = data[i] | (data[i + 1] << 8) | (data[i + 2] << 16) | (data[i + 3] << 24)
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
        h = ((h << 13) | (h >> 19)) & 0xFFFFFFFF
        h = (h * 5 + 0xE6546B64) & 0xFFFFFFFF
    k = 0
    tail = length & 0x3
    if tail >= 3:
        k ^= data[rounded + 2] << 16
    if tail >= 2:
        k ^= data[rounded + 1] << 8
    if tail >= 1:
        k ^= data[rounded]
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
    h ^= length
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & 0xFFFFFFFF
    h ^= h >> 16
    return h


def partition_id_for(value: str, num_partitions: int) -> int:
    """Slot id per the reference: hash & Integer.MAX_VALUE % n."""
    return (murmur3_32(value.encode("utf-8")) & 0x7FFFFFFF) % num_partitions


def murmur3_route_col(col: Column, num_partitions: int) -> Column:
    """Column of routing slot ids (BIGINT), Arrow-batched."""

    @pandas_udf("long")
    def _route(s: pd.Series) -> pd.Series:
        # Partition-value cardinality is tiny relative to row count
        # (it's a partition key): hash each distinct value once per
        # Arrow batch, then broadcast-map — ~cardinality hashes instead
        # of ~batch-size.
        lut = {v: partition_id_for(v, num_partitions) for v in s.unique()}
        return s.map(lut)

    return _route(col)


__all__ = ["murmur3_32", "partition_id_for", "murmur3_route_col"]
