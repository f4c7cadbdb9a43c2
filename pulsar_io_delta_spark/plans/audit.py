"""Physical-plan audit: assert the plans we designed for are the plans
Catalyst actually picks (PERF.md table). Run as a module to print the
audit for the current code:

    python -m pulsar_io_delta_spark.plans.audit [sf_dir]

At 100 TB the same assertions hold structurally (broadcasts flip to
shuffle joins only where the build side genuinely outgrows the
threshold — that is AQE doing its job, not a regression).
"""

from __future__ import annotations

import sys

from pyspark.sql import DataFrame

# query name → fragments that must appear in the executed plan
EXPECTATIONS: dict[str, list[str]] = {
    "q_agg_groupby": ["HashAggregate", "PushedFilters"],  # partial agg + pushdown
    "q_join_broadcast": ["BroadcastHashJoin"],
    "q_topk": ["TakeOrderedAndProject"],  # never a global sort
    "q_sim_topk": ["BroadcastNestedLoopJoin"],  # broadcast query side
    "q_snapshot_scan": ["ReadSchema: struct<l_orderkey"],  # column pruning
    "q_time_travel_filter": ["PushedFilters"],
    # round-5 ops: column pruning must reach the parquet scan (2 of 5 /
    # 2 of 6 columns; the 100 TB text/event scans read nothing else)
    "q_chunk_docs": ["ReadSchema: struct<doc_id:bigint,text:string>"],
    "q_tfidf_topterms": ["ReadSchema: struct<doc_id:bigint,text:string>"],
    "q_retention_cohort": ["ReadSchema: struct<ts"],
}


def executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def audit(spark, sf_dir: str) -> dict[str, dict[str, bool]]:
    from pulsar_io_delta_spark.registry import all_queries

    specs = all_queries()
    out: dict[str, dict[str, bool]] = {}
    for name, fragments in EXPECTATIONS.items():
        plan = executed_plan(specs[name].fn(spark, sf_dir))
        out[name] = {frag: (frag in plan) for frag in fragments}
    return out


def main() -> int:
    from pulsar_io_delta_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    results = audit(spark, sf_dir)
    ok = True
    for name, checks in results.items():
        for frag, hit in checks.items():
            print(f"{'PASS' if hit else 'FAIL'} {name}: {frag}")
            ok = ok and hit
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
