"""Fixture-drift regression guard for the events.ts loader.

Round 4 postmortem: the driver regenerated events.parquet from
TIMESTAMP(NANOS) to timestamp[us] and every events-path query broke —
the batch loader with a hard AnalysisException, the stream with
silently wrong answers (timestamps collapsed to 1970). These tests pin
the contract of ``tables.normalize_events_ts``: all three encodings the
driver has produced (or could produce) normalize to the SAME instants,
and anything else fails loudly.
"""

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql.types import TimestampType

from pulsar_io_delta_spark.tables import normalize_events_ts, table

INSTANTS_US = [
    1704067200_000_000,  # 2024-01-01T00:00:00Z
    1704067200_000_001,  # +1µs — survives every encoding
    1706745599_999_999,  # 2024-01-31T23:59:59.999999Z
]


def _write(tmp_path, name, arrow_type, values):
    path = str(tmp_path / f"{name}.parquet")
    t = pa.table({"event_id": list(range(len(values))), "ts": pa.array(values, type=arrow_type)})
    pq.write_table(t, path)
    return path


@pytest.mark.parametrize(
    "name,arrow_type,scale",
    [
        ("ns", pa.timestamp("ns"), 1000),  # rounds 1-3 physical encoding
        ("us_ntz", pa.timestamp("us"), 1),  # round-4 regeneration
        ("us_utc", pa.timestamp("us", tz="UTC"), 1),
    ],
)
def test_all_encodings_normalize_to_same_instants(spark, tmp_path, name, arrow_type, scale):
    path = _write(tmp_path, name, arrow_type, [v * scale for v in INSTANTS_US])
    df = normalize_events_ts(spark.read.parquet(path))
    assert isinstance(df.schema["ts"].dataType, TimestampType)
    got = sorted(r.ts for r in df.select("ts").collect())
    want = [
        datetime.datetime.fromtimestamp(v / 1e6, tz=datetime.timezone.utc).replace(tzinfo=None)
        for v in INSTANTS_US
    ]
    assert got == want, f"{name}: {got} != {want}"


def test_unsupported_encoding_fails_loudly(spark, tmp_path):
    # a string ts must raise, not silently produce garbage
    path = str(tmp_path / "bad.parquet")
    pq.write_table(pa.table({"event_id": [1], "ts": ["2024-01-01"]}), path)
    with pytest.raises(TypeError, match="unsupported physical type"):
        normalize_events_ts(spark.read.parquet(path))


def test_fixture_loader_yields_plausible_years(spark, sf_dir):
    """Whatever the driver wrote, table() must produce TIMESTAMP columns
    with in-range instants for EVERY declared event-time column — the
    loud early warning if a future fixture regeneration flips an
    encoding the normalizer doesn't know."""
    import pyspark.sql.functions as F

    from pulsar_io_delta_spark.tables import TS_COLUMNS

    for tname, cols in TS_COLUMNS.items():
        df = table(spark, sf_dir, tname)
        for c in cols:
            assert isinstance(df.schema[c].dataType, TimestampType), (tname, c)
            lo, hi = df.agg(F.min(F.year(c)), F.max(F.year(c))).first()
            assert 1990 <= lo <= hi <= 2100, (tname, c, lo, hi)


def test_events_stream_matches_batch_instants(spark, sf_dir):
    """The stream (footer-derived schema) and batch loader agree on min/max ts."""
    import pyspark.sql.functions as F

    from pulsar_io_delta_spark.streaming.runner import events_stream, run_to_memory

    s = events_stream(spark, sf_dir)
    out = run_to_memory(
        s.agg(F.min("ts").alias("lo"), F.max("ts").alias("hi")), output_mode="complete"
    ).first()
    b = table(spark, sf_dir, "events").agg(F.min("ts").alias("lo"), F.max("ts").alias("hi")).first()
    assert (out.lo, out.hi) == (b.lo, b.hi)
