"""transformWithStateInPandas operators (Spark 4.x stateful API).

ENVIRONMENT GATE: the TWS state-server protocol speaks protobuf from
the Python side; in containers without the ``protobuf`` package the
driver pre-init worker crashes with ``ImportError: cannot import name
'descriptor' from 'google.protobuf'``. ``tws_available()`` probes for
that dependency so callers (and the pinned test) gate loudly instead
of surfacing Spark's opaque "driver worker exited unexpectedly".
``applyInPandasWithState`` (queries/extra_surface.py) covers custom
stateful processing without this dependency — it ships rows, not
protobuf state-server RPCs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.types import LongType, StructField, StructType


def tws_available() -> bool:
    """True when transformWithStateInPandas can run here (protobuf
    importable — the state-server client requires it)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


RUNNING_TOTALS_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("running_cnt", LongType()),
        StructField("running_cents", LongType()),
    ]
)


def running_totals(stream_df: DataFrame) -> DataFrame:
    """Per-user running count + exact running cents over a stream of
    (user_id, event_id, cents), via a ValueState-backed
    StatefulProcessor: state = (cnt, total_cents), rows sorted by
    (event_id) within each batch so output is deterministic, totals
    carried across micro-batches. Integer cents keep the contract
    float-free (floor(value·100) is IEEE-identical on any engine).

    Requires the RocksDB state store provider (Spark's TWS
    constraint); set spark.sql.streaming.stateStore.providerClass
    before starting the query. Raises ImportError via tws_available()
    callers when protobuf is absent."""
    import pandas as pd
    from pyspark.sql.streaming import StatefulProcessor

    if not tws_available():
        raise ImportError(
            "transformWithStateInPandas needs the protobuf package "
            "(state-server protocol); use applyInPandasWithState here"
        )

    state_schema = StructType(
        [StructField("cnt", LongType()), StructField("cents", LongType())]
    )

    class _RunningTotals(StatefulProcessor):
        def init(self, handle):
            self._acc = handle.getValueState("acc", state_schema)

        def handleInputRows(self, key, rows, timer_values):
            pdf = pd.concat(list(rows)).sort_values("event_id")
            prev = self._acc.get()
            cnt, cents = (int(prev[0]), int(prev[1])) if prev else (0, 0)
            out = []
            for eid, c in zip(pdf["event_id"], pdf["cents"]):
                cnt += 1
                cents += int(c)
                out.append((int(key[0]), int(eid), cnt, cents))
            self._acc.update((cnt, cents))
            yield pd.DataFrame(
                out, columns=["user_id", "event_id", "running_cnt", "running_cents"]
            )

        def close(self):
            pass

    return stream_df.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_RunningTotals(),
        outputStructType=RUNNING_TOTALS_SCHEMA,
        outputMode="Append",
        timeMode="None",
    )
