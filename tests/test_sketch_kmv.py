"""xxhash64 SQL-twin parity and KMV sketch properties."""

import duckdb
import pyspark.sql.functions as F

from pulsar_io_delta_spark.functions.xxhash_sql import xxhash64_long_ctes


def test_xxhash64_sql_twin_parity(spark):
    """The DuckDB CTE chain must be byte-exact with Spark's native
    xxhash64 on longs — negatives, extremes, zero included."""
    vals = [0, 1, -1, 42, -42, 2**63 - 1, -(2**63), 123456789, -987654321,
            10**15, -(10**15)]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT unnest($1::BIGINT[]) AS v", [vals]
    )
    got = dict(
        con.execute(
            f"WITH {xxhash64_long_ctes('t')} SELECT v, h FROM xx64"
        ).fetchall()
    )
    sdf = spark.createDataFrame([(v,) for v in vals], "v long").select(
        "v", F.xxhash64("v").alias("h")
    )
    M = 1 << 64
    for r in sdf.collect():
        unsigned = got[r.v]
        signed = unsigned - M if unsigned >= (1 << 63) else unsigned
        assert signed == r.h, (r.v, signed, r.h)


def test_kmv_exact_below_k(spark, sf_dir):
    """Groups with fewer than k distinct members report EXACTLY (the
    sketch holds the whole set), and every estimate is positive."""
    from pulsar_io_delta_spark.queries.pipeline3 import q_sketch_kmv

    rows = q_sketch_kmv(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.kmv_est > 0
        if r.exact_distinct < 64:
            assert r.kmv_est == r.exact_distinct


def test_kmv_merge_equals_rebuild(spark):
    """Mergeability — the property the sketch family exists for: the
    union-then-truncate of two partitions' k-minimum sets equals the
    k-minimum set of the union, so a rollup store can combine daily
    sketches without touching raw data."""
    df = spark.range(0, 5000).select(F.col("id").alias("user_id"))
    a = df.where(F.col("user_id") % 2 == 0)
    b = df.where(F.col("user_id") % 3 == 0)
    k = 64

    def kmins(d):
        h = d.select(
            F.expr("xxhash64(user_id) ^ CAST(-9223372036854775808 AS BIGINT)").alias("f")
        ).distinct()
        return sorted(r.f for r in h.orderBy("f").limit(k).collect())

    merged = sorted(set(kmins(a)) | set(kmins(b)))[:k]
    rebuilt = kmins(a.unionAll(b).distinct())
    assert merged == rebuilt


def test_kmv_intersect_estimate_quality(spark, sf_dir):
    """The intersection estimate must land within the sketch's
    theoretical error band on the real fixture: with k=64 the relative
    standard error of the Jaccard×union composition is ~1/sqrt(k) per
    factor; assert a generous 3-sigma-ish bound (<75% rel err) on every
    pair with a non-trivial exact intersection, and exactness when the
    merged sketch is below k."""
    from pulsar_io_delta_spark.queries.pipeline3 import q_sketch_kmv_intersect

    rows = q_sketch_kmv_intersect(spark, sf_dir).collect()
    assert len(rows) >= 3
    for r in rows:
        assert r.union_est > 0
        if r.exact_inter >= 50:
            rel = abs(r.inter_est - r.exact_inter) / r.exact_inter
            assert rel < 0.75, (r.type_a, r.type_b, r.exact_inter, r.inter_est)
