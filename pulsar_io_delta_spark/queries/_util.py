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
    """Exact order-independent sum: equal to ``sum(cast(x as
    decimal(p,s)))`` cast back to double, computed on the scaled-long
    fast path — ``sum(round(x·10^s) as long) / 10^s``.

    Equivalence: both paths round x to the nearest 10^-s (HALF_UP away
    from zero in Spark's round AND its double→decimal cast; binary
    doubles cannot land exactly on a .5 tie at a decimal scale unless
    the double itself is k+0.5, where both round identically), then sum
    exactly in integer arithmetic. The DuckDB oracle keeps the literal
    decimal SQL (sql_dsum) — the full gate verifies the hash parity.

    Why: decimal aggregation allocates a Decimal per row inside codegen;
    the long path is primitive-only — measured 2.3× on the TPC-H Q1
    shape (PERF.md round-5). Bounds: partial sums stay exact while
    10^s·max|x|·partition_rows < 2^63 (s ≤ 6 and ~5M-row partitions
    under default maxPartitionBytes leave ≥ 3 orders of headroom), and
    the final double conversion is single-rounded while the scaled
    total < 2^53 — the same rounding the decimal→double cast performs.
    """
    c = F.col(col) if isinstance(col, str) else col
    factor = _scale_factor(prec)
    return F.sum(F.round(c * F.lit(factor)).cast("long")).cast("double") / F.lit(factor)


def _scale_factor(prec: str) -> float:
    scale = int(prec.split(",")[1]) if "," in prec else 0
    return float(10**scale)


def dsum_over(col: str | Column, prec: str, window) -> Column:
    """:func:`dsum` over a window frame — same scaled-long fast path and
    the same decimal-SQL oracle equivalence, applied per frame."""
    c = F.col(col) if isinstance(col, str) else col
    factor = _scale_factor(prec)
    return (
        F.sum(F.round(c * F.lit(factor)).cast("long")).over(window).cast("double")
        / F.lit(factor)
    )


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
