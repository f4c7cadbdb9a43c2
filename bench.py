"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": <float>}

Each query is forced end-to-end with the noop sink (full computation,
no driver materialization cost). A warmup query amortizes JVM/session
startup out of the numbers.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pulsar_io_delta_spark.registry import all_queries  # noqa: E402
from pulsar_io_delta_spark.session import get_spark  # noqa: E402

HEADLINE = [
    # reference surface
    "q_snapshot_scan",
    "q_cdc_envelope",
    "q_hash_route",
    # relational core
    "q_agg_groupby",
    "q_agg_rollup",
    "q_join_inner",
    "q_join_broadcast",
    "q_join_range",
    "q_window_rank",
    "q_topk",
    # streaming
    "q_stream_tumbling",
    "q_stream_watermark_dedup",
    # LLM pipeline
    "q_dedup_exact",
    "q_dedup_minhash",
    "q_text_tokens",
    "q_text_quality",
    "q_sim_topk",
    # training-data pipeline (round 2)
    "q_sample_hash",
    "q_repetition_metrics",
    "q_domain_cap",
    "q_pulsar_wire",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf"))
    except ValueError:
        sf = -1.0
    spark = get_spark(app_name="pids-bench")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_queries()

    def run(name: str) -> float:
        t0 = time.time()
        df = specs[name].fn(spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        return time.time() - t0

    # Warmup: session/parquet caches + Python UDF worker pool (pandas-UDF
    # queries otherwise pay ~1-2 s one-time worker startup in their timing).
    from pyspark.sql.functions import col, pandas_udf

    run("q_filter_project")
    identity = pandas_udf("long")(lambda s: s)
    spark.range(1000).select(identity(col("id"))).write.mode("overwrite").format(
        "noop"
    ).save()

    # Best-of-2: the first execution of a query pays one-time whole-stage
    # codegen compilation (measured ~4 s for the 7-aggregate Q1 tree);
    # steady-state is what a resident engine delivers.
    timings: dict[str, float] = {}
    for name in HEADLINE:
        timings[name] = round(min(run(name), run(name)), 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline query wall time (noop sink, local)",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
