"""Connector facade: the reference Source's lifecycle on Spark.

A user of the reference configures ``{tablePath, startingVersion |
startingTimestamp, includeHistoryData, ...}`` and gets a partitioned
CDC record stream. This module reproduces that contract:

- :class:`ConnectorConfig` — the reference's validation rules
  (`DeltaLakeConnectorConfig.java:35-99`): ``tablePath`` required,
  ``startingVersion`` XOR ``startingTimestamp``, ``"latest"`` → -1,
  ``includeHistoryData`` default false.
- :class:`Checkpoint` — the reference's cursor
  (`DeltaCheckpoint.java:28-89`) with the *intended* total order
  (SURVEY §2.4 #7: FULL_COPY sorts before INCREMENTAL_COPY, value
  comparison not object identity).
- :func:`assigned_partitions` — round-robin partition→instance
  assignment with the intended guard (SURVEY §2.4 #2).
- :class:`DeltaCdcConnector` — open → (FULL_COPY bootstrap snapshot |
  INCREMENTAL_COPY log tail) → CDC envelope → murmur3 routing, as
  DataFrames (`DeltaLakeConnectorSource.java:62-112`).

Durable progress comes from Structured Streaming checkpoints + the
Delta sink's txn markers (sources/delta_log.py), replacing the
reference's per-partition state store (which, as written, never
persisted anything — SURVEY §2.4 #8).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime, timezone
from functools import total_ordering
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pulsar_io_delta_spark.operators.cdc import OP_INSERT, partition_value_expr
from pulsar_io_delta_spark.sources.delta_log import DeltaTable

LATEST = -1

FULL_COPY = "FULL_COPY"
INCREMENTAL_COPY = "INCREMENTAL_COPY"


class ConfigError(ValueError):
    pass


@dataclass
class ConnectorConfig:
    table_path: str
    starting_version: int | None = None
    starting_timestamp_ms: int | None = None
    include_history_data: bool = False
    topic_partition_num: int = 8

    @classmethod
    def load(cls, conf: dict[str, Any]) -> "ConnectorConfig":
        """Bind + validate with the reference's rules
        (`DeltaLakeConnectorConfig.java:60-99`)."""
        table_path = conf.get("tablePath")
        if not table_path:
            raise ConfigError("tablePath is required")
        version = conf.get("startingVersion")
        timestamp = conf.get("startingTimestamp")
        if version is not None and timestamp is not None:
            raise ConfigError("startingVersion and startingTimestamp are mutually exclusive")
        if isinstance(version, str):
            version = LATEST if version == "latest" else int(version)
        ts_ms: int | None = None
        if timestamp is not None:
            # ISO-8601 per the reference's parser
            try:
                dt = datetime.fromisoformat(str(timestamp).replace("Z", "+00:00"))
            except ValueError as exc:
                raise ConfigError(f"invalid ISO-8601 startingTimestamp: {timestamp}") from exc
            if dt.tzinfo is None:
                dt = dt.replace(tzinfo=timezone.utc)
            ts_ms = int(dt.timestamp() * 1000)
        return cls(
            table_path=str(table_path),
            starting_version=version,
            starting_timestamp_ms=ts_ms,
            include_history_data=bool(conf.get("includeHistoryData", False)),
            topic_partition_num=int(conf.get("topicPartitionNum", 8)),
        )


@total_ordering
@dataclass
class Checkpoint:
    """Resumable position: bootstrap positions precede incremental ones;
    then (version, file index, row) lexicographic — the intended
    ordering of `DeltaCheckpoint.java:66-82`."""

    state: str = FULL_COPY
    snapshot_version: int = 0
    file_index: int = 0
    row_num: int = 0

    def _key(self) -> tuple[int, int, int, int]:
        return (
            0 if self.state == FULL_COPY else 1,
            self.snapshot_version,
            self.file_index,
            self.row_num,
        )

    def __lt__(self, other: "Checkpoint") -> bool:
        return self._key() < other._key()

    def __eq__(self, other: object) -> bool:
        return isinstance(other, Checkpoint) and self._key() == other._key()


def assigned_partitions(num_partitions: int, instance_id: int, num_instances: int) -> list[int]:
    """Round-robin topic-partition → connector-instance assignment —
    the intended semantics of `DeltaLakeConnectorSource.java:125-132`
    (the as-written guard assigns almost nothing; SURVEY §2.4 #2)."""
    if not (0 <= instance_id < num_instances):
        raise ConfigError(f"instance_id {instance_id} out of range [0, {num_instances})")
    return [p for p in range(num_partitions) if p % num_instances == instance_id]


@dataclass
class DeltaCdcConnector:
    """open() → start checkpoint; batches() → enveloped, routed records."""

    config: ConnectorConfig
    table: DeltaTable = field(init=False)
    start: Checkpoint = field(init=False)

    def __post_init__(self) -> None:
        self.table = DeltaTable(self.config.table_path)

    def open(self) -> Checkpoint:
        """Resolve the starting checkpoint exactly as the fresh-start
        path does (`DeltaLakeConnectorSource.java:160-187`)."""
        version = self.table.resolve_version(
            None if self.config.starting_version in (None, LATEST) else self.config.starting_version,
            self.config.starting_timestamp_ms,
        )
        state = FULL_COPY if self.config.include_history_data else INCREMENTAL_COPY
        self.start = Checkpoint(state=state, snapshot_version=version)
        return self.start

    def _envelope(self, df: DataFrame, version: int) -> DataFrame:
        pcols = self.table.snapshot(version).partition_columns
        if "partition_value" not in df.columns:
            pv = partition_value_expr({c: F.col(c) for c in pcols}) if pcols else F.lit("")
            df = df.withColumn("partition_value", pv)
        from pulsar_io_delta_spark.functions.murmur3 import with_route_lowcard

        # partition_value cardinality ~ number of table partitions:
        # hash distincts + broadcast join, no full-column Arrow round trip
        return with_route_lowcard(
            df, F.col("partition_value"), self.config.topic_partition_num
        )

    def bootstrap(self, spark: SparkSession) -> DataFrame:
        """FULL_COPY phase: whole snapshot at the start version as op='c'
        records (`DeltaReader.java:174-184`)."""
        v = self.start.snapshot_version
        snap_df = self.table.read(spark, version=v)
        ts_ms = max(self.table.snapshot(v).add_times.values(), default=0)
        df = (
            snap_df.withColumn("op", F.lit(OP_INSERT))
            .withColumn("ts", F.timestamp_millis(F.lit(ts_ms)))
            .withColumn("_commit_version", F.lit(v))
        )
        return self._envelope(df, v)

    def tail(self, spark: SparkSession, from_version: int | None = None) -> DataFrame:
        """INCREMENTAL_COPY phase: change feed from the checkpointed
        version (`DeltaReader.java:185-251`, all versions ≥ start)."""
        v = self.start.snapshot_version if from_version is None else from_version
        return self._envelope(self.table.cdc(spark, start_version=v), v)

    def read(self, spark: SparkSession) -> DataFrame:
        """The connector's full record stream from its start checkpoint:
        bootstrap ∪ tail-after-bootstrap (or tail only)."""
        self.open()
        if self.start.state == FULL_COPY:
            boot = self.bootstrap(spark)
            later = self.table.versions()[-1] > self.start.snapshot_version
            if later:
                inc = self.tail(spark, self.start.snapshot_version + 1)
                return boot.unionByName(inc, allowMissingColumns=True)
            return boot
        return self.tail(spark)

    def poll(self, spark: SparkSession, cursor: Checkpoint) -> tuple[DataFrame | None, Checkpoint]:
        """One micro-batch of the incremental loop: records committed
        after ``cursor``, plus the advanced cursor. Returns (None,
        cursor) when the table has no new commits — the reference's
        reader thread's steady-state poll (`DeltaReaderThread.java:48-73`),
        minus its fail-stop bug (no data ≠ failure).
        """
        latest = self.table.latest_version()
        frm = cursor.snapshot_version + (0 if cursor.state == FULL_COPY else 1)
        if latest < frm:
            return None, cursor
        df = self._envelope(self.table.cdc(spark, start_version=frm), latest)
        return df, Checkpoint(state=INCREMENTAL_COPY, snapshot_version=latest)

    def run(self, spark: SparkSession, sink, max_polls: int = 1) -> Checkpoint:
        """Driver loop: bootstrap (if FULL_COPY) then poll-and-deliver
        ``max_polls`` times into ``sink(df)``. The cursor after each
        delivered batch is the durable restart position."""
        cursor = self.open()
        if cursor.state == FULL_COPY:
            sink(self.bootstrap(spark))
            cursor = Checkpoint(state=INCREMENTAL_COPY, snapshot_version=cursor.snapshot_version)
        for _ in range(max_polls):
            df, cursor = self.poll(spark, cursor)
            if df is not None:
                sink(df)
        return cursor
