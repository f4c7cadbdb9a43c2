"""Shared determinism helpers for declared queries (FIXTURES.md §5).

The core trick for hash-matching floating aggregates across engines:
``sum(double)`` is order-dependent, and Spark/DuckDB accumulate in
different orders. ``sum(CAST(x AS DECIMAL(p,s)))`` is exact and
order-independent; casting the same double to the same decimal type is
deterministic and identical in both engines, so the decimal sums match
bit-for-bit, and a final ``CAST(_ AS DOUBLE)`` + ``round(_, 4)`` yields
identical doubles. At 100 TB scale decimal aggregation is also the
numerically sane choice for money columns — no drift at 1e12-row sums.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dsum(col: str | Column, prec: str) -> Column:
    """Exact order-independent sum: cast to decimal, sum, back to double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal({prec})")).cast("double")


def r4(c: Column) -> Column:
    return F.round(c, 4)


def epoch_s(col: str | Column) -> Column:
    """Timestamp → epoch seconds (BIGINT); UTC session pinned by tables.py."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_timestamp(c).cast("long")


# DuckDB-side fragments mirroring the helpers above.
def sql_dsum(expr: str, prec: str) -> str:
    return f"CAST(sum(CAST({expr} AS DECIMAL({prec}))) AS DOUBLE)"


def sql_epoch(expr: str) -> str:
    return f"CAST(floor(epoch({expr})) AS BIGINT)"
