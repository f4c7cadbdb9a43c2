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
