"""q_scd2_dim's window composition vs a brute-force Python SCD2
builder on a random event log (bursty users, repeated states, ts
ties broken by event_id)."""

from __future__ import annotations

import datetime
import random

from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _scd2_df(events_df):
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        events_df.select("user_id", "ts", "event_id", "event_type")
        .withColumn("prev_state", F.lag("event_type").over(w))
        .where(
            F.col("prev_state").isNull()
            | (F.col("prev_state") != F.col("event_type"))
        )
    )
    return changes.select(
        "user_id",
        F.row_number().over(w).alias("version"),
        F.col("event_type").alias("state"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        F.lead("ts").over(w).isNull().alias("is_current"),
    )


def _scd2_brute(rows):
    by_user = {}
    for r in rows:
        by_user.setdefault(r[0], []).append(r)
    out = []
    for uid, evs in by_user.items():
        evs.sort(key=lambda r: (r[1], r[2]))  # (ts, event_id)
        changes = [e for i, e in enumerate(evs) if i == 0 or evs[i - 1][3] != e[3]]
        for i, e in enumerate(changes):
            nxt = changes[i + 1][1] if i + 1 < len(changes) else None
            out.append((uid, i + 1, e[3], e[1], nxt, nxt is None))
    return sorted(out)


def test_scd2_matches_bruteforce(spark):
    rng = random.Random(20260814)
    base = datetime.datetime(2024, 3, 1)
    states = ["bronze", "silver", "gold"]
    rows = []
    eid = 0
    for uid in range(30):
        t = 0
        for _ in range(rng.randrange(0, 40)):
            # ts ties on purpose: ~20% of steps repeat the same second
            if rng.random() > 0.2:
                t += rng.randrange(1, 5000)
            rows.append(
                (
                    uid,
                    base + datetime.timedelta(seconds=t),
                    eid,
                    rng.choice(states),
                )
            )
            eid += 1
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string"
    )
    got = sorted(
        (r.user_id, r.version, r.state, r.valid_from, r.valid_to, r.is_current)
        for r in _scd2_df(df).collect()
    )
    assert got == _scd2_brute(rows)


def test_ewma_matches_decimal_bruteforce(spark):
    """q_ewma's decimal window fold vs a Python decimal.Decimal fold on
    a random event log — exact equality, including half-boundary
    values (the sf0.1 failure class: exact folds landing ON the 4-dp
    half boundary must round away from zero in both engines)."""
    import decimal
    import random

    from pulsar_io_delta_spark.queries.pipeline2 import q_ewma  # noqa: F401
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    rng = random.Random(7)
    base = datetime.datetime(2024, 5, 1)
    rows = []
    for eid in range(400):
        rows.append(
            (
                eid,
                eid % 13,
                base + datetime.timedelta(seconds=eid * 17),
                round(rng.uniform(0.01, 200.0), 2),
            )
        )
    # force a known half-boundary case: 0.3*x + 0.7*acc over (1.05, 1.0)
    # = 1.015 -> at scale 2dp inputs many folds end in ...5
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )

    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-9, 0)
    q = F.col("value").cast("decimal(18,2)").cast("decimal(30,22)")
    frames = df.select(
        "event_id", "user_id", F.collect_list(q).over(w).alias("lst")
    )
    rest = F.slice(F.col("lst"), 2, F.greatest(F.size("lst") - 1, F.lit(0)))
    a, b = F.lit("0.3").cast("decimal(2,1)"), F.lit("0.7").cast("decimal(2,1)")
    fold = F.aggregate(
        rest,
        F.element_at(F.col("lst"), 1),
        lambda acc, x: (a * x + b * acc).cast("decimal(30,22)"),
    )
    got = {
        r.event_id: r.e
        for r in frames.select(
            "event_id", F.round(fold, 4).cast("double").alias("e")
        ).collect()
    }

    D = decimal.Decimal
    by_user = {}
    for eid, uid, ts, v in rows:
        by_user.setdefault(uid, []).append((ts, eid, D(str(v))))
    expect = {}
    for uid, evs in by_user.items():
        evs.sort()
        for i in range(len(evs)):
            frame = [v for _, _, v in evs[max(0, i - 9) : i + 1]]
            acc = frame[0]
            for x in frame[1:]:
                acc = D("0.3") * x + D("0.7") * acc
            expect[evs[i][1]] = float(
                acc.quantize(D("0.0001"), rounding=decimal.ROUND_HALF_UP)
            )
    assert got == expect


def test_zscore_flag_matches_bruteforce(spark):
    """Integer z-score flag vs Python fractions-based exact comparison
    on random 2-dp values (ties on the 2-sigma boundary included)."""
    import random
    from fractions import Fraction

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    rng = random.Random(99)
    base = datetime.datetime(2024, 6, 1)
    rows = []
    for eid in range(500):
        rows.append(
            (
                eid,
                eid % 11,
                base + datetime.timedelta(seconds=eid * 31),
                round(rng.uniform(0.0, 50.0), 2),
            )
        )
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    xq = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-19, 0)
    s = df.select(
        "event_id",
        xq.alias("xq"),
        F.count("*").over(w).alias("n"),
        F.sum(xq).over(w).alias("sx"),
        F.sum(xq * xq).over(w).alias("sxx"),
    )
    dev = F.col("xq") * F.col("n") - F.col("sx")
    got = {
        r.event_id: r.o
        for r in s.select(
            "event_id",
            (dev * dev > 4 * (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))).alias("o"),
        ).collect()
    }

    by_user = {}
    for eid, uid, ts, v in rows:
        by_user.setdefault(uid, []).append((ts, eid, round(v * 100)))
    expect = {}
    for uid, evs in by_user.items():
        evs.sort()
        for i in range(len(evs)):
            frame = [x for _, _, x in evs[max(0, i - 19) : i + 1]]
            n = len(frame)
            mu = Fraction(sum(frame), n)
            var = Fraction(sum(x * x for x in frame), n) - mu * mu
            x = frame[-1]
            expect[evs[i][1]] = (Fraction(x) - mu) ** 2 > 4 * var
    assert got == expect


def test_hampel_flag_matches_bruteforce(spark):
    """Integer Hampel flag vs Python statistics.median + Fraction on
    random 2-dp values — exact equality over every frame parity."""
    import random
    import statistics
    from fractions import Fraction

    from pulsar_io_delta_spark.registry import all_queries

    rng = random.Random(4242)
    base = datetime.datetime(2024, 7, 1)
    rows = []
    for eid in range(420):
        v = round(rng.uniform(0.0, 30.0), 2)
        if rng.random() < 0.05:
            v = round(v * 40, 2)  # planted spikes the filter must flag
        rows.append((eid, eid % 9, base + datetime.timedelta(seconds=eid * 23), v))
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )

    import os
    import tempfile

    d = tempfile.mkdtemp(prefix="hampel_")
    df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    got = {
        r.event_id: r.is_outlier
        for r in all_queries()["q_hampel_filter"].fn(spark, d).collect()
    }

    by_user = {}
    for eid, uid, ts, v in rows:
        by_user.setdefault(uid, []).append((ts, eid, round(v * 100)))
    expect = {}
    for uid, evs in by_user.items():
        evs.sort()
        for i in range(len(evs)):
            frame = [x for _, _, x in evs[max(0, i - 14) : i + 1]]
            med = Fraction(statistics.median(frame))
            mad = Fraction(statistics.median([abs(Fraction(x) - med) for x in frame]))
            x = frame[-1]
            expect[evs[i][1]] = abs(Fraction(x) - med) > 3 * mad
    assert got == expect
