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
    decimal(p,s)))`` cast back to double, computed on a scaled-long
    fast path — quantize each row decimal-exactly, sum as primitive
    longs, divide once.

    Per-row quantization is ``cast(x as decimal(p,s)) * 10^s → long``:
    the decimal CAST is the oracle's own rounding (shortest-decimal-
    repr HALF_UP — NOT ``round(x·10^s)``, which rounds the binary
    product and disagrees on values like 0.145 where 0.145·100 =
    14.499999999999998), and decimal(p,s)·10^s is always integral, so
    the long cast is exact. The aggregation buffer stays a primitive
    long — the part decimal aggregation makes expensive (per-row
    Decimal allocation in the sum buffer). The DuckDB oracle keeps the
    literal decimal SQL (sql_dsum); the full gate verifies hash parity.

    Bounds, enforced here: the fast path applies only at scale ≤ 6, so
    10^s·max|x|·partition_rows stays ≪ 2^63 for decimal(18,s) inputs
    and ~5M-row partitions, and the final double conversion is
    single-rounded while the scaled total < 2^53 — the same rounding
    the decimal→double cast performs. scale > 6 falls back to the
    literal decimal aggregate (exact, identical to the oracle, no long
    headroom to reason about). Values overflowing decimal(p,s) become
    null (non-ANSI cast) — the same domain where the oracle's decimal
    sum errors, i.e. out of contract — never a wrapped long.
    """
    return _quantized_sum(col, prec)


def _quantized_sum(col: str | Column, prec: str, window=None) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    scale = int(prec.split(",")[1]) if "," in prec else 0
    if scale > 6:
        # Past the fast path's headroom bound: sum the decimals
        # themselves — exact and order-independent, just not primitive.
        s = F.sum(c.cast(f"decimal({prec})"))
        if window is not None:
            s = s.over(window)
        return s.cast("double")
    factor = 10**scale
    q = (c.cast(f"decimal({prec})") * F.lit(factor)).cast("long")
    s = F.sum(q)
    if window is not None:
        s = s.over(window)
    return s.cast("double") / F.lit(float(factor))


def dsum_over(col: str | Column, prec: str, window) -> Column:
    """:func:`dsum` over a window frame — same decimal-exact quantized
    long sum and the same decimal-SQL oracle equivalence, per frame."""
    return _quantized_sum(col, prec, window=window)


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


from pulsar_io_delta_spark.operators.par import fan_out  # noqa: E402,F401
