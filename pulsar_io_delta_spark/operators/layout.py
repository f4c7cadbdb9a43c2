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


def interleave_bits(b1, b2, bits: int = 16):
    """Morton/Z-curve bit interleave of two non-negative integer bucket
    columns: bit i of ``b1`` lands at position 2i, bit i of ``b2`` at
    2i+1. Pure integer shift/mask built-ins — codegen'd, narrow, and
    engine-portable (the DuckDB oracle reproduces it with the same
    shifts), unlike any float-bucketed formulation."""
    from pyspark.sql import functions as F

    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(b1, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(F.shiftleft(F.shiftright(b2, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    return z


def zorder_value(c1, c2, min1, max1, min2, max2, bits: int = 16):
    """Z-curve value interleaving the bits of two equi-width-bucketed
    numeric columns — pure built-in expressions (codegen'd, narrow).

    Equi-width bucketing (width_bucket over the global min/max, one
    cheap agg) trades a little balance vs equi-depth for a fully
    distributed computation — no global rank window."""
    from pyspark.sql import functions as F

    n = 1 << bits
    b1 = (F.width_bucket(c1.cast("double"), F.lit(min1), F.lit(max1), F.lit(n)) - 1).cast("long")
    b2 = (F.width_bucket(c2.cast("double"), F.lit(min2), F.lit(max2), F.lit(n)) - 1).cast("long")
    return interleave_bits(b1, b2, bits)


def write_zordered(
    table: DeltaTable,
    df: DataFrame,
    col1: str,
    col2: str,
    num_files: int = 16,
    mode: str = "append",
) -> int:
    """Commit ``df`` Z-ordered on two columns: files cover compact 2-D
    tiles of the (col1, col2) space, so BOTH columns' footer min/max are
    tight and a box predicate (range on either or both) skips most
    files — the multi-dimension generalization of write_clustered.
    One agg (global min/max) + one range shuffle; scales like any
    repartition-and-sort write."""
    from pyspark.sql import functions as F

    lo1, hi1, lo2, hi2 = df.agg(
        F.min(col1), F.max(col1), F.min(col2), F.max(col2)
    ).first()
    z = zorder_value(
        F.col(col1), F.col(col2), float(lo1), float(hi1) + 1e-9, float(lo2), float(hi2) + 1e-9
    )
    ordered = (
        df.withColumn("_z", z)
        .repartitionByRange(num_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
    )
    return table.write(ordered, mode=mode)


def write_bucketed(
    df: DataFrame,
    name: str,
    path: str,
    bucket_col: str,
    num_buckets: int = 8,
) -> None:
    """Persist ``df`` hash-bucketed (and sorted) on ``bucket_col`` as a
    catalog parquet table at ``path``.

    This is the co-located-join layout for fact⋈fact joins at 100 TB
    (PERF.md): two tables bucketed the SAME way on the join key scan
    with a matching hash output-partitioning, so the join plans a
    sort-merge with ZERO exchanges — the shuffle was paid once at write
    time and is amortized over every subsequent join. The writer is an
    ordinary repartition-and-sort write; file count = num_buckets ×
    write tasks is the knob to tune against small files.
    """
    (
        df.write.mode("overwrite")
        .format("parquet")
        .option("path", path)
        .bucketBy(num_buckets, bucket_col)
        .sortBy(bucket_col)
        .saveAsTable(name)
    )


def bucketed_join(spark, left_name: str, right_name: str, on: str) -> DataFrame:
    """Equi-join two same-bucketed catalog tables on the bucket key —
    plans exchange-free when the bucket specs match."""
    return spark.table(left_name).join(spark.table(right_name), on)


def skipping_ratio(table: DeltaTable, filters: list[tuple[str, str, object]]) -> float:
    """Fraction of files a filtered read would skip (1.0 = all skipped)."""
    snap = table.snapshot()
    if not snap.files:
        return 0.0
    kept = table.prune_files(snap, filters)
    return 1.0 - len(kept) / len(snap.files)


# --------------------------------------------------------------------------
# Hilbert curve (liquid clustering's space-filling order; round 9)


def hilbert_index(coords, bits: int = 16):
    """d-dimensional Hilbert index of (n, d) non-negative integer
    coordinates in [0, 2^bits) — vectorized Skilling AxesToTranspose
    ("Programming the Hilbert curve", AIP Conf. Proc. 707, 2004; the
    public-domain transpose formulation) followed by the MSB-first bit
    interleave of the transpose.

    The Hilbert order is what liquid clustering sorts by instead of the
    Z-order: consecutive index values are always GRID NEIGHBORS (no
    Z-curve jumps), so every file covers one compact blob of key space
    and per-file min/max stays tight on every clustering column. numpy
    uint64 kernels over the whole batch — executed inside an
    Arrow-batched pandas UDF, cost O(bits × d) vector ops per batch."""
    import numpy as np

    x = np.ascontiguousarray(coords, dtype=np.uint64).copy()
    n, d = x.shape
    if bits * d > 63:
        raise ValueError(f"hilbert_index: bits({bits}) * dims({d}) must be <= 63")
    one = np.uint64(1)
    # AxesToTranspose: inverse-undo excess work, then Gray decode
    q = one << np.uint64(bits - 1)
    while q > one:
        p = q - one
        for i in range(d):
            hot = (x[:, i] & q) != 0
            x[hot, 0] ^= p  # invert low bits of dim 0
            t = (x[~hot, 0] ^ x[~hot, i]) & p  # exchange low bits 0<->i
            x[~hot, 0] ^= t
            x[~hot, i] ^= t
        q >>= one
    for i in range(1, d):
        x[:, i] ^= x[:, i - 1]
    t = np.zeros(n, dtype=np.uint64)
    q = one << np.uint64(bits - 1)
    while q > one:
        hot = (x[:, d - 1] & q) != 0
        t[hot] ^= q - one
        q >>= one
    for i in range(d):
        x[:, i] ^= t
    # transpose -> index: bit b of dim i lands at position b*d + (d-1-i)
    h = np.zeros(n, dtype=np.uint64)
    for b in range(bits - 1, -1, -1):
        for i in range(d):
            h = (h << one) | ((x[:, i] >> np.uint64(b)) & one)
    return h.astype(np.int64)


def hilbert_col(cols: list, ranges: list[tuple[float, float]], bits: int = 16):
    """Column expression: Hilbert index of d numeric columns, each
    equi-width bucketed to ``bits`` bits over its global [lo, hi]
    range. The bucketing is plain built-in arithmetic (codegen'd); only
    the O(bits·d) bit-twiddle runs in an Arrow-batched pandas UDF over
    already-bucketed longs — the narrow slow-path surface."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    def _kernel(*buckets):  # no hints: variadic scalar pandas UDF
        import numpy as np
        import pandas as pd

        arr = np.column_stack([b.to_numpy(dtype=np.int64) for b in buckets])
        return pd.Series(hilbert_index(arr, bits=bits))

    _hilbert = pandas_udf(_kernel, "long")

    n = 1 << bits
    bucketed = []
    for c, (lo, hi) in zip(cols, ranges):
        col = F.col(c) if isinstance(c, str) else c
        b = (
            F.width_bucket(col.cast("double"), F.lit(float(lo)),
                           F.lit(float(hi) + 1e-9), F.lit(n)) - 1
        ).cast("long")
        bucketed.append(F.greatest(F.lit(0), F.least(b, F.lit(n - 1))))
    return _hilbert(*bucketed)


def write_hilbert_clustered(
    table: DeltaTable,
    df: DataFrame,
    cols: list[str],
    num_files: int = 16,
    mode: str = "append",
    bits: int = 16,
) -> int:
    """Commit ``df`` Hilbert-ordered on ``cols``: the d-dimensional
    generalization of write_zordered with strictly better locality
    (liquid clustering's layout). One agg for global ranges + one range
    shuffle on the index."""
    from pyspark.sql import functions as F

    aggs = []
    for c in cols:
        aggs += [F.min(c), F.max(c)]
    row = df.agg(*aggs).first()
    ranges = [(float(row[2 * i]), float(row[2 * i + 1])) for i in range(len(cols))]
    h = hilbert_col([F.col(c) for c in cols], ranges, bits=bits)
    ordered = (
        df.withColumn("_h", h)
        .repartitionByRange(num_files, "_h")
        .sortWithinPartitions("_h")
        .drop("_h")
    )
    return table.write(ordered, mode=mode)


GEOHASH_BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_expr(lat_microdeg, lng_microdeg, chars: int = 8):
    """Geohash encode from EXACT integer microdegrees — the spatial
    blocking key for geo-tagged corpora (same-cell equi-joins replace
    distance theta-joins, exactly like LSH buckets replace all-pairs;
    prefix truncation coarsens the cell).

    Equi-width bucket each coordinate to 20 bits with integer floor
    division (no float geometry — engine-portable), interleave with the
    Morton kernel (longitude on the odd/most-significant positions per
    geohash convention), then emit ``chars`` base32 characters from the
    top bits. 8 chars = 40 bits = the standard ~19 m cell. Verified
    identical to the classic float-bisection geohash on 50k random
    microdegree points (tests/test_pipeline3.py) — the integer floor
    is the exact value the bisection approximates.
    ``lat_microdeg``/``lng_microdeg`` are SQL expression strings in
    [-90e6, 90e6] / [-180e6, 180e6]; the poles/antimeridian clamp into
    the last cell."""
    from pyspark.sql import functions as F

    n = 1 << 20
    blat = F.expr(
        f"least(((({lat_microdeg}) + 90000000) * {n}) div 180000000, {n - 1})"
    )
    blng = F.expr(
        f"least(((({lng_microdeg}) + 180000000) * {n}) div 360000000, {n - 1})"
    )
    # b2 = lng takes odd bit positions, so bit 39 (the MSB of the
    # 40-bit cell id) is a longitude bit — geohash's "lng first".
    z = interleave_bits(blat, blng, 20)
    alphabet = F.array(*[F.lit(c) for c in GEOHASH_BASE32])
    out = F.lit("")
    for k in range(chars):
        idx = F.shiftright(z, 35 - 5 * k).bitwiseAND(F.lit(31)).cast("int")
        out = F.concat(out, F.get(alphabet, idx))
    return out
