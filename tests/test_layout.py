"""Clustered layout makes data skipping effective; random layout doesn't."""

import pyspark.sql.functions as F

from pulsar_io_delta_spark.operators.layout import skipping_ratio, write_clustered
from pulsar_io_delta_spark.sources.delta_log import DeltaTable
from pulsar_io_delta_spark.tables import table


def test_clustered_layout_skips_random_does_not(spark, sf_dir, tmp_path):
    ev = table(spark, sf_dir, "events").select("event_id", "ts", "user_id", "value")
    filters = [("event_id", ">=", 900)]  # top 10% of ids

    rand_t = DeltaTable(str(tmp_path / "rand"))
    # shuffle-random layout: every file spans nearly the full id range
    rand_t.write(ev.repartition(8))
    clus_t = DeltaTable(str(tmp_path / "clus"))
    write_clustered(clus_t, ev, "event_id", num_files=8)

    r_rand = skipping_ratio(rand_t, filters)
    r_clus = skipping_ratio(clus_t, filters)
    assert r_rand == 0.0  # nothing skippable
    assert r_clus >= 0.75  # ≥6 of 8 files skipped

    # correctness unchanged by layout
    expected = ev.where("event_id >= 900").count()
    assert clus_t.read(spark, filters=filters).count() == expected
    assert rand_t.read(spark, filters=filters).count() == expected


def test_clustered_timestamps(spark, sf_dir, tmp_path):
    ev = table(spark, sf_dir, "events").select("event_id", "ts", "value")
    t = DeltaTable(str(tmp_path / "byts"))
    write_clustered(t, ev.withColumn("ts_epoch", F.unix_timestamp("ts")), "ts_epoch", 8)
    cut = ev.agg(F.expr("percentile_approx(unix_timestamp(ts), 0.9)")).first()[0]
    ratio = skipping_ratio(t, [("ts_epoch", ">=", int(cut))])
    assert ratio >= 0.75


def test_zorder_skips_on_both_dimensions(spark, tmp_path):
    from pulsar_io_delta_spark.operators.layout import write_zordered

    df = spark.range(40_000).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 200).cast("double").alias("user_id"),
        (F.floor(F.col("id") / 200)).cast("double").alias("value"),
    )
    # random layout: every file spans the full range on both columns
    rnd = DeltaTable(str(tmp_path / "rnd"))
    rnd.write(df.repartition(16))
    # z-ordered: files cover compact (user_id, value) tiles
    zo = DeltaTable(str(tmp_path / "zo"))
    write_zordered(zo, df, "user_id", "value", num_files=16)

    box = [("user_id", ">=", 0.0), ("user_id", "<", 25.0),
           ("value", ">=", 0.0), ("value", "<", 25.0)]
    r_rnd = skipping_ratio(rnd, box)
    r_zo = skipping_ratio(zo, box)
    assert r_rnd == 0.0          # nothing prunable
    assert r_zo >= 0.5           # most tiles outside the box are skipped
    # correctness unaffected by layout
    a = zo.read(spark, filters=box).count()
    b = rnd.read(spark, filters=box).count()
    assert a == b > 0


def test_bucketed_join_plans_no_exchange(spark, sf_dir, tmp_path):
    """Two tables bucketed identically on the join key sort-merge-join
    with ZERO exchanges: the shuffle is paid once at write time — the
    co-located fact-fact join layout for 100 TB (PERF.md)."""
    from pulsar_io_delta_spark.operators.layout import bucketed_join, write_bucketed

    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    od = table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    write_bucketed(li, "bkt_lineitem", str(tmp_path / "bl"), "l_orderkey", 8)
    write_bucketed(od, "bkt_orders", str(tmp_path / "bo"), "l_orderkey", 8)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "bkt_lineitem", "bkt_orders", "l_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan
        # correctness: same count as the plain shuffled join
        expected = li.join(od, "l_orderkey").count()
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bkt_lineitem")
        spark.sql("DROP TABLE IF EXISTS bkt_orders")


# ---------------------------------------------------------------------------
# Liquid clustering: Hilbert index + clusteredTable lifecycle (round 9)


def test_hilbert_index_matches_classic_2d():
    """The vectorized Skilling transpose kernel reproduces the classic
    rotation-based 2-D Hilbert mapping bit for bit."""
    import numpy as np

    from pulsar_io_delta_spark.operators.layout import hilbert_index

    def xy2d(order, x, y):  # Wikipedia's reference formulation
        d = 0
        s = order // 2
        while s > 0:
            rx = 1 if (x & s) > 0 else 0
            ry = 1 if (y & s) > 0 else 0
            d += s * s * ((3 * rx) ^ ry)
            if ry == 0:
                if rx == 1:
                    x, y = s - 1 - x, s - 1 - y
                x, y = y, x
            s //= 2
        return d

    bits, n = 4, 16
    pts = np.array([(x, y) for x in range(n) for y in range(n)], dtype=np.uint64)
    h = hilbert_index(pts, bits=bits)
    ref = np.array([xy2d(n, int(x), int(y)) for x, y in pts])
    assert np.array_equal(h, ref)


def test_hilbert_index_bijective_and_adjacent():
    """THE Hilbert property, in d=2..4: the index is a bijection on the
    grid and consecutive index values are always L1-distance-1 grid
    neighbors (a Z-curve fails the adjacency check at every tile seam —
    this is what makes Hilbert the liquid-clustering order)."""
    import numpy as np

    from pulsar_io_delta_spark.operators.layout import hilbert_index

    for d, b in ((2, 5), (3, 4), (4, 3)):
        n = 1 << b
        grid = (
            np.stack(np.meshgrid(*[np.arange(n)] * d, indexing="ij"), axis=-1)
            .reshape(-1, d)
            .astype(np.uint64)
        )
        h = hilbert_index(grid, bits=b)
        assert len(set(h.tolist())) == len(h), (d, b)
        order = np.argsort(h)
        steps = np.abs(np.diff(grid[order].astype(int), axis=0)).sum(axis=1)
        assert (steps == 1).all(), (d, b)


def test_liquid_cluster_lifecycle(spark, sf_dir, tmp_path):
    """cluster_by create → protocol carries clusteredTable +
    domainMetadata → Hilbert OPTIMIZE makes a 2-D box predicate skip
    most files → content identical → the clustering domain survives a
    checkpoint round trip."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity"
    )
    t = DeltaTable(str(tmp_path / "liq"))
    t.write(li.repartition(8), cluster_by=["l_partkey", "l_suppkey"])
    assert t.clustering_columns() == ["l_partkey", "l_suppkey"]
    feats = set(t.snapshot().protocol.get("writerFeatures") or ())
    assert {"clusteredTable", "domainMetadata"} <= feats

    # scale-relative box (~25% of each key range) so the predicate is
    # selective at every sf the suite runs at
    mp, ms = li.agg(F.max("l_partkey"), F.max("l_suppkey")).first()
    box = [("l_partkey", "<=", mp // 4), ("l_suppkey", "<=", ms // 4)]
    assert skipping_ratio(t, box) == 0.0  # shuffle-random: nothing skips
    t.optimize_clustered(spark, target_files=8)
    assert skipping_ratio(t, box) >= 0.5
    expected = li.where(
        (F.col("l_partkey") <= mp // 4) & (F.col("l_suppkey") <= ms // 4)
    ).count()
    assert t.read(spark, filters=box).count() == expected
    assert t.read(spark).count() == li.count()

    # the domain survives checkpoint-based bootstrap
    t.checkpoint()
    t.expire_log()
    t2 = DeltaTable(str(tmp_path / "liq"))
    assert t2.clustering_columns() == ["l_partkey", "l_suppkey"]


def test_cluster_by_guards(spark, sf_dir, tmp_path):
    """cluster_by is creation-only, unpartitioned, and schema-checked;
    optimize_clustered refuses unclustered tables."""
    import pytest

    from pulsar_io_delta_spark.sources.delta_log import DeltaProtocolError

    ev = table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    t = DeltaTable(str(tmp_path / "g1"))
    with pytest.raises(DeltaProtocolError, match="mutually exclusive"):
        t.write(ev, partition_by=["user_id"], cluster_by=["event_id"])
    with pytest.raises(DeltaProtocolError, match="not in schema"):
        t.write(ev, cluster_by=["nope"])
    t.write(ev, cluster_by=["event_id", "value"])
    with pytest.raises(DeltaProtocolError, match="CREATING write"):
        t.write(ev, cluster_by=["event_id"])
    plain = DeltaTable(str(tmp_path / "g2"))
    plain.write(ev)
    with pytest.raises(DeltaProtocolError, match="without delta.clustering"):
        plain.optimize_clustered(spark)


def test_alter_cluster_by(spark, sf_dir, tmp_path):
    """CLUSTER BY on an existing table is metadata-only: arm, re-key,
    and remove (CLUSTER BY NONE) without any data rewrite; the next
    optimize_clustered materializes the current key set."""
    from pulsar_io_delta_spark.sources.delta_log import DeltaProtocolError
    import pytest

    ev = table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    t = DeltaTable(str(tmp_path / "alt"))
    t.write(ev.repartition(4))
    files_before = set(t.snapshot().files)
    t.alter_cluster_by(["event_id", "user_id"])
    assert t.clustering_columns() == ["event_id", "user_id"]
    assert set(t.snapshot().files) == files_before  # no rewrite
    feats = set(t.snapshot().protocol.get("writerFeatures") or ())
    assert {"clusteredTable", "domainMetadata"} <= feats
    # re-key
    t.alter_cluster_by(["user_id"])
    assert t.clustering_columns() == ["user_id"]
    # CLUSTER BY NONE removes the domain; optimize_clustered refuses
    t.alter_cluster_by([])
    assert t.clustering_columns() == []
    with pytest.raises(DeltaProtocolError, match="without delta.clustering"):
        t.optimize_clustered(spark)
    with pytest.raises(DeltaProtocolError, match="not in schema"):
        t.alter_cluster_by(["nope"])
    # partitioned tables refuse
    p = DeltaTable(str(tmp_path / "part"))
    p.write(ev.withColumn("par", F.col("event_id") % 2), partition_by=["par"])
    with pytest.raises(DeltaProtocolError, match="unpartitioned"):
        p.alter_cluster_by(["event_id"])
