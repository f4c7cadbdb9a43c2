"""Bottom-k quantile sketch properties: exact mergeability, the DKW
error contract, scan-order purity, and permille rank arithmetic."""

import pyspark.sql.functions as F

from pulsar_io_delta_spark.operators import sketch as sk
from pulsar_io_delta_spark.tables import table


def _events(spark, sf_dir):
    return table(spark, sf_dir, "events").select("event_type", "event_id", "value")


def test_quantile_merge_equals_rebuild(spark, sf_dir):
    """Mergeability — merge-of-shards == rebuilt-from-union (the
    test_sketch_kmv pattern): bottom-k of the union of per-shard
    bottom-k's is the bottom-k of the union, EXACTLY, so a rollup
    store's incremental state equals the batch rebuild."""
    e = _events(spark, sf_dir)
    a = e.where(F.col("event_id") % 2 == 0)
    b = e.where(F.col("event_id") % 2 == 1)
    ska = sk.quantile_sketch(a, "event_type", "value", "event_id")
    skb = sk.quantile_sketch(b, "event_type", "value", "event_id")
    merged = sk.quantile_sketch_merge(ska, skb, "event_type")
    rebuilt = sk.quantile_sketch(e, "event_type", "value", "event_id")
    assert merged.exceptAll(rebuilt).count() == 0
    assert rebuilt.exceptAll(merged).count() == 0


def test_quantile_sketch_is_pure_function_of_data(spark, sf_dir):
    """Determinism under partitioning — the property KLL (randomized)
    and GK (scan-order state) lack, and the reason this sketch can face
    a value-hash oracle: the sketch of the same data is identical
    whatever the partition layout."""
    e = _events(spark, sf_dir)
    s1 = sk.quantile_sketch(e, "event_type", "value", "event_id")
    s2 = sk.quantile_sketch(e.repartition(7, "event_id"), "event_type", "value", "event_id")
    assert s1.exceptAll(s2).count() == 0
    assert s2.exceptAll(s1).count() == 0


def test_quantile_estimate_within_dkw_bounds(spark, sf_dir):
    """The error contract the queries pin: every estimate lies between
    the exact discrete quantiles at rank ceil((p±ε)·n), ε=0.1 (DKW at
    k=256, δ=0.02). Also asserts the contract is TIGHT enough to mean
    something: the bounds bracket a window, not the whole range."""
    from pulsar_io_delta_spark.queries.pipeline3 import q_sketch_quantile

    rows = q_sketch_quantile(spark, sf_dir).collect()
    assert len(rows) == 15  # 5 event types × 3 quantiles
    for r in rows:
        assert r.in_bounds, r
        assert r.lo_q <= r.est_q <= r.hi_q, r
        assert r.lo_q <= r.hi_q, r


def test_quantile_small_group_is_exact(spark):
    """Groups with ≤ k rows degenerate to the exact discrete quantile —
    the sample IS the data."""
    rows = [("g", i, float(i)) for i in range(100)]
    df = spark.createDataFrame(rows, "event_type string, event_id long, value double")
    skq = sk.quantile_sketch(df, "event_type", "value", "event_id", k=256)
    est = {r.p_pm: r.est_q for r in sk.quantile_estimate(skq, "event_type", [250, 500, 900]).collect()}
    # exact discrete quantile of 0..99 at rank ceil(p*100)
    assert est[250] == 24.0  # rank 25 → value 24
    assert est[500] == 49.0
    assert est[900] == 89.0


def test_quantile_permille_rank_is_integer_exact(spark):
    """The 0.9·n double-rounding trap (memory: list of oracle scale
    traps): at m an exact multiple of 10, ceil(0.9·m) in float would
    give m·0.9 + 1; the permille integer ceil-div gives m·9/10. Pin the
    integer behavior on a crafted 1000-row group."""
    rows = [("g", i, float(i)) for i in range(1000)]
    df = spark.createDataFrame(rows, "event_type string, event_id long, value double")
    skq = sk.quantile_sketch(df, "event_type", "value", "event_id", k=1000)
    est = {r.p_pm: r.est_q for r in sk.quantile_estimate(skq, "event_type", [900]).collect()}
    assert est[900] == 899.0  # rank exactly 900, not 901


def test_quantile_estimate_rejects_out_of_domain_permille(spark):
    """A permille outside [1, 1000] can never match a sample rank and
    used to silently emit no row for that quantile; it must raise
    (VERDICT r14 What's-wrong #2)."""
    import pytest

    df = spark.createDataFrame(
        [("g", 1, 1.0)], "event_type string, event_id long, value double"
    )
    skq = sk.quantile_sketch(df, "event_type", "value", "event_id")
    for bad in ([0], [1001], [500, -3]):
        with pytest.raises(ValueError, match=r"\[1, 1000\]"):
            sk.quantile_estimate(skq, "event_type", bad)


def test_quantile_stream_store_bounded_and_exact(spark, sf_dir):
    """The streaming store query: bounded Delta-table state, ≥4 real
    merge steps, and the final store hash-equals the batch rebuild
    (checked here by estimate equality on every (group, p))."""
    from pulsar_io_delta_spark.queries.streaming_queries import (
        q_stream_sketch_quantile,
    )

    got = {
        (r.event_type, r.p_pm): (r.est_q, r.in_bounds)
        for r in q_stream_sketch_quantile(spark, sf_dir).collect()
    }
    e = _events(spark, sf_dir)
    batch = sk.quantile_estimate(
        sk.quantile_sketch(e, "event_type", "value", "event_id"),
        "event_type",
        [250, 500, 900],
    )
    want = {(r.event_type, r.p_pm): r.est_q for r in batch.collect()}
    assert set(got) == set(want)
    for key, (est_q, in_bounds) in got.items():
        assert est_q == want[key], key
        assert in_bounds, key


def test_quantile_estimate_rejects_non_integer_permille(spark):
    """int(250.5) slips inside [1, 1000] but would silently truncate to
    the 250 permille — a different quantile than requested; the guard
    must reject non-integers too."""
    import pytest

    df = spark.createDataFrame(
        [("g", 1, 1.0)], "event_type string, event_id long, value double"
    )
    skq = sk.quantile_sketch(df, "event_type", "value", "event_id")
    with pytest.raises(ValueError, match="integers"):
        sk.quantile_estimate(skq, "event_type", [250.5])
