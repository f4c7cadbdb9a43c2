"""DuckDB SQL twin of Spark's ``xxhash64`` over ONE BIGINT column.

Spark's ``F.xxhash64(col)`` (seed 42) is the engine's native 64-bit
hash — the right primitive for sketch operators because it is JVM-side
at any cardinality (no Python, no collect). Oracles need the SAME hash
in DuckDB, which has no xxhash64 builtin; this module emits a CTE chain
computing it with exact 64-bit wrapping arithmetic (UHUGEINT products
reduced mod 2^64, rotations as disjoint shift pairs, xor/shift
avalanche). Byte-exact parity with Spark is pinned in
tests/test_sketch_kmv.py over negative, zero and large inputs.

Single-8-byte-input xxHash64 (the long specialization Spark applies
per field): h = rotl27(h0 xor rotl31(v*P2)*P1)*P1 + P4, then the
standard avalanche; h0 = seed + P5 + 8.
"""

from __future__ import annotations

P1 = 11400714785074694791
P2 = 14029467366897019727
P3 = 1609587929392839161
P4 = 9650029242287828579
P5 = 2870177450012600261
M64 = 1 << 64
H0 = (42 + P5 + 8) % M64  # seed 42, length 8


def xxhash64_long_ctes(source_cte: str, col: str = "v") -> str:
    """CTE chain ending in ``xx64(v, h)``: h = xxhash64(v) as UBIGINT,
    for the distinct values of ``source_cte.{col}`` (BIGINT, negatives
    handled by two's-complement normalization)."""
    m = M64
    return f"""
xxin AS (SELECT DISTINCT {col} AS v FROM {source_cte}),
xxu AS (SELECT v,
    CAST((((v::HUGEINT % {m}) + {m}) % {m}) AS UBIGINT) AS u FROM xxin),
xxk1 AS (SELECT v, u,
    CAST((u::UHUGEINT * {P2}) % {m} AS UBIGINT) AS k1 FROM xxu),
xxk2 AS (SELECT v,
    CAST(((k1::UHUGEINT * {1 << 31}) + (k1 >> 33)) % {m} AS UBIGINT) AS k1r
  FROM xxk1),
xxk3 AS (SELECT v,
    CAST((k1r::UHUGEINT * {P1}) % {m} AS UBIGINT) AS k1f FROM xxk2),
xxh1 AS (SELECT v, xor(CAST({H0} AS UBIGINT), k1f) AS h FROM xxk3),
xxh2 AS (SELECT v,
    CAST((((h::UHUGEINT * {1 << 27}) + (h >> 37)) % {m}) AS UBIGINT) AS h
  FROM xxh1),
xxh3 AS (SELECT v,
    CAST(((h::UHUGEINT * {P1}) + {P4}) % {m} AS UBIGINT) AS h FROM xxh2),
xxa1 AS (SELECT v, xor(h, h >> 33) AS h FROM xxh3),
xxa2 AS (SELECT v,
    CAST((h::UHUGEINT * {P2}) % {m} AS UBIGINT) AS h FROM xxa1),
xxa3 AS (SELECT v, xor(h, h >> 29) AS h FROM xxa2),
xxa4 AS (SELECT v,
    CAST((h::UHUGEINT * {P3}) % {m} AS UBIGINT) AS h FROM xxa3),
xx64 AS (SELECT v, xor(h, h >> 32) AS h FROM xxa4)"""
