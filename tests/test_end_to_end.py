"""The reference connector's entire job in one test: parquet events →
partitioned Delta table → streaming CDC (checkpointed, exactly-once) →
CDC envelope → murmur3-routed egress into the (fake) Pulsar broker.

Reference lifecycle being mirrored: `DeltaLakeConnectorSource.java`
open → bootstrap FULL copy → incremental log tail → per-record
`DeltaRecord` envelope → producer send keyed by canonical partition
value (murmur3 seed 0). Every stage here is the Spark-native
equivalent wired end-to-end, not the per-stage unit tests elsewhere.
"""

import pyspark.sql.functions as F

from pulsar_io_delta_spark.functions.murmur3 import partition_id_for
from pulsar_io_delta_spark.operators.pipeline import to_pulsar_wire
from pulsar_io_delta_spark.sources.datasource import register_delta_cdc
from pulsar_io_delta_spark.sources.delta_log import DeltaTable
from pulsar_io_delta_spark.streaming.fake_pulsar import FakeBroker, publish
from pulsar_io_delta_spark.tables import table

N_PART = 8


def _drain(spark, path, ck, broker, topic):
    """One availableNow run of the CDC stream → envelope → broker."""

    def egress(batch_df, _bid):
        value = F.to_json(
            F.struct("event_id", "event_type", "op", "_commit_version")
        )
        wire = to_pulsar_wire(
            batch_df.orderBy("_commit_version", "event_id"),
            "partition_value",
            value,
            num_partitions=N_PART,
        )
        publish(wire, broker, topic, N_PART)

    q = (
        spark.readStream.format("pulsar_delta_cdc")
        .option("tablePath", path)
        .load()
        .writeStream.foreachBatch(egress)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)


def test_reference_lifecycle_end_to_end(spark, sf_dir, tmp_path):
    register_delta_cdc(spark)
    path, ck = str(tmp_path / "tbl"), str(tmp_path / "ck")
    topic = "events-cdc"

    e = table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    bootstrap = e.where(F.col("event_id") % 5 != 0)
    tail = e.where(F.col("event_id") % 5 == 0)

    # 1. bootstrap commit + one incremental commit, partitioned like the
    #    reference's source table (event_type is the partition column)
    t = DeltaTable(path)
    t.write(bootstrap, partition_by=["event_type"])
    t.write(tail, partition_by=["event_type"])

    # 2-4. stream the log with a checkpoint, envelope, publish
    broker = FakeBroker()
    _drain(spark, path, ck, broker, topic)

    n = e.count()
    assert broker.total_messages(topic) == n

    # murmur3 slot parity: each message sits where seed-0 routing says
    for p in range(N_PART):
        for msg in broker.partition_log(topic, p):
            assert partition_id_for(msg.key, N_PART) == p
            assert msg.key.startswith("event_type=")

    # every event arrived exactly once, with its commit version
    import json

    seen = {}
    for p in range(N_PART):
        for msg in broker.partition_log(topic, p):
            rec = json.loads(msg.value.decode())
            assert rec["event_id"] not in seen
            seen[rec["event_id"]] = rec
    assert len(seen) == n
    assert {r["op"] for r in seen.values()} == {"c"}
    assert {r["_commit_version"] for r in seen.values()} == {0, 1}

    # 5. restart against the same checkpoint: exactly-once → no new msgs
    _drain(spark, path, ck, broker, topic)
    assert broker.total_messages(topic) == n

    # 6. a third commit is delivered incrementally (only the delta)
    extra = spark.createDataFrame(
        [(10_000_001, "view", 1.0), (10_000_002, "click", 2.0)],
        "event_id long, event_type string, value double",
    )
    t.write(extra, partition_by=["event_type"])
    _drain(spark, path, ck, broker, topic)
    assert broker.total_messages(topic) == n + 2
    new = [
        json.loads(m.value.decode())
        for p in range(N_PART)
        for m in broker.partition_log(topic, p)
        if json.loads(m.value.decode())["event_id"] > 10_000_000
    ]
    assert {r["event_id"] for r in new} == {10_000_001, 10_000_002}
    assert {r["_commit_version"] for r in new} == {2}


def test_incremental_view_maintenance_over_cdc(spark, tmp_path):
    """IVM: a per-user count summary (itself a Delta table) maintained
    incrementally by the CDC stream via additive merge_upsert. Two
    source commits drained in separate runs over ONE checkpoint (a
    restart in between): the summary must equal the batch groupBy of
    the full source — the continuous-aggregate workflow a warehouse
    runs on top of the connector, with exactly-once arithmetic (a
    replayed batch would double-count, a skipped one would undercount).
    At 100 TB the delta each batch is batch-sized, the merge rewrite
    touches only summary files with changed users."""
    import pyspark.sql.functions as F

    from pulsar_io_delta_spark.sources.datasource import register_delta_cdc
    from pulsar_io_delta_spark.sources.delta_log import DeltaTable

    register_delta_cdc(spark)
    src = DeltaTable(str(tmp_path / "src"))
    summ = DeltaTable(str(tmp_path / "summary"))
    ckpt = str(tmp_path / "ckpt")

    def events(lo, hi):
        return spark.range(lo, hi).select(
            F.col("id").alias("event_id"), (F.col("id") % 5).alias("user_id")
        )

    def maintain(batch_df, _batch_id):
        delta = (
            batch_df.where(F.col("op") == "c")
            .groupBy("user_id")
            .agg(F.count("*").alias("cnt"))
        )
        if summ.exists():
            cur = summ.read(spark).select("user_id", F.col("cnt").alias("_cur"))
            merged = (
                delta.join(cur, "user_id", "left")
                .select(
                    "user_id",
                    (F.col("cnt") + F.coalesce("_cur", F.lit(0))).alias("cnt"),
                )
            )
            summ.merge_upsert(spark, merged, ["user_id"])
        else:
            summ.write(delta)

    def drain():
        q = (
            spark.readStream.format("pulsar_delta_cdc")
            .option("tablePath", src.path)
            .load()
            .writeStream.foreachBatch(maintain)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300)

    src.write(events(0, 103))
    drain()
    src.write(events(103, 150))
    drain()  # restart over the same checkpoint: only the new commit

    got = {(r.user_id, r.cnt) for r in summ.read(spark).collect()}
    want = {
        (r.user_id, r.cnt)
        for r in events(0, 150).groupBy("user_id").agg(F.count("*").alias("cnt")).collect()
    }
    assert got == want, (sorted(got), sorted(want))


def test_dedup_clustering_to_delta_delete_end_to_end(spark, sf_dir, tmp_path):
    """The training-data pipeline capstone: corpus lands in a Delta
    table, near-dup CLUSTERS are found (candidate-pair edges →
    connected components), non-canonical members are deleted with a
    row-level DELETE, and the CDC stream then replays insert + delete
    ops whose net effect IS the kept corpus. Ties the LLM dedup
    surface to the reference's CDC surface in one flow."""
    from pulsar_io_delta_spark.operators.graph import connected_components

    path = str(tmp_path / "corpus")
    d = table(spark, sf_dir, "documents").select("doc_id", "text").limit(200)
    # plant exact dups: doc_id+1e6 copies of every doc
    corpus = d.unionAll(
        d.select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text")
    )
    t = DeltaTable(path)
    t.write(corpus, mode="overwrite")

    hashed = corpus.select("doc_id", F.md5(F.encode("text", "UTF-8")).alias("h"))
    grp = hashed.groupBy("h").agg(F.min("doc_id").alias("m"))
    edges = (
        hashed.join(grp, "h")
        .where(F.col("doc_id") != F.col("m"))
        .select(F.col("doc_id").alias("src"), F.col("m").alias("dst"))
    )
    labels = connected_components(corpus.select("doc_id"), edges, id_col="doc_id")
    drops = sorted(
        r.id for r in labels.where(F.col("id") != F.col("component")).collect()
    )
    assert drops, "planted dups must produce non-canonical members"

    t.delete_where(spark, f"doc_id IN ({','.join(map(str, drops))})")

    kept = {r.doc_id for r in t.read(spark).select("doc_id").collect()}
    expect_kept = {
        r.id for r in labels.where(F.col("id") == F.col("component")).collect()
    }
    assert kept == expect_kept

    # CDC replay: the delete is a file REWRITE (remove old files +
    # re-add kept rows), so per-row net state is last-op-wins by
    # commit version, exactly how a downstream materializer consumes
    # the reference's stream: latest 'c' => live, latest 'r' => gone
    # (a rewrite emits 'r' for the old file and 'c' for kept rows at
    # the same version; the tie resolves to live).
    from pyspark.sql import Window

    cdc = t.cdc(spark)
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("_commit_version"), F.asc("op")  # 'c' sorts before 'r' on ties
    )
    last = (
        cdc.withColumn("rn", F.row_number().over(w))
        .where("rn = 1")
        .select("doc_id", "op")
    )
    live = {r.doc_id for r in last.where("op = 'c'").collect()}
    gone = {r.doc_id for r in last.where("op = 'r'").collect()}
    assert live == kept
    assert gone == set(drops)
