"""Runtime-optimizer evidence for the 100 TB story: AQE skew-join
splitting and runtime bloom-filter pushdown are CONFIG, not code — but
at scale they are the difference between a straggler-bound shuffle join
and a balanced one, so these tests pin that our session/conf choices
actually engage them (and document the knobs in one place, PERF.md
"runtime optimizations")."""

import contextlib

import pyspark.sql.functions as F
import pytest


@contextlib.contextmanager
def confs(spark, **kv):
    old = {}
    for k, v in kv.items():
        key = k.replace("__", ".")
        try:
            old[key] = spark.conf.get(key)
        except Exception:
            old[key] = None
        spark.conf.set(key, str(v))
    try:
        yield
    finally:
        for key, v in old.items():
            if v is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, v)


def _final_plan(df) -> str:
    # Execute THIS DataFrame's own QueryExecution (a .write would spawn
    # a fresh one): AQE's final plan only exists after the run.
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_aqe_splits_skewed_join_partitions(spark):
    """One hot key holding ~half the rows of a shuffle join: AQE must
    mark and split the skewed partition (skew=true in the final SMJ)
    instead of letting one reducer drag the stage — the salting
    operator (operators/joins.py) is for keys SO hot they exceed even
    split partitions; AQE handles the everyday case for free."""
    left = spark.range(400_000).select(
        F.when(F.col("id") % 2 == 0, 0).otherwise(F.col("id")).alias("k"),
        F.concat(F.lit("x" * 64), F.col("id").cast("string")).alias("pad"),
    )
    right = spark.range(5_000).select(F.col("id").alias("k"), F.lit(1).alias("r"))
    with confs(
        spark,
        **{
            "spark.sql.adaptive.enabled": "true",
            "spark.sql.adaptive.skewJoin.enabled": "true",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.1",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1MB",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "512KB",
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        },
    ):
        plan = _final_plan(left.join(right, "k").select("k", "pad", "r"))
    assert "skew=true" in plan, plan


def test_runtime_bloom_filter_reaches_fact_scan(spark, tmp_path):
    """A selective dim-side filter should inject a bloom filter into
    the fact side of a shuffle join (might_contain over a
    bloom_filter_agg scalar subquery in the plan): rows that cannot match are dropped BEFORE the fact shuffle.
    At 100 TB this is a many-fold shuffle-volume cut whenever the dim
    predicate is selective; thresholds here are lowered because the
    fixture is tiny, the production defaults engage automatically at
    real scan sizes."""
    fact_p = str(tmp_path / "fact")
    dim_p = str(tmp_path / "dim")
    spark.range(300_000).select(
        (F.col("id") % 50_000).alias("k"), F.col("id").alias("v")
    ).write.mode("overwrite").parquet(fact_p)
    spark.range(50_000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("tag")
    ).write.mode("overwrite").parquet(dim_p)

    fact = spark.read.parquet(fact_p)
    dim = spark.read.parquet(dim_p).where(F.col("tag") == 3)  # ~1% selective
    with confs(
        spark,
        **{
            "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        },
    ):
        df = fact.join(dim, "k").select("k", "v", "tag")
        plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "might_contain" in plan and "bloom_filter_agg" in plan, plan


def test_bloom_filter_preserves_results(spark, tmp_path):
    """Same join with and without the runtime filter must agree."""
    fact_p = str(tmp_path / "fact2")
    spark.range(100_000).select(
        (F.col("id") % 10_000).alias("k"), F.col("id").alias("v")
    ).write.mode("overwrite").parquet(fact_p)
    fact = spark.read.parquet(fact_p)
    dim = spark.range(10_000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("tag")
    ).where(F.col("tag") == 3)

    def run():
        return (
            fact.join(dim, "k")
            .agg(F.count("*").alias("c"), F.sum("v").alias("s"))
            .first()
        )

    with confs(
        spark,
        **{
            "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        },
    ):
        with_bloom = run()
    with confs(
        spark, **{"spark.sql.optimizer.runtime.bloomFilter.enabled": "false"}
    ):
        without = run()
    assert with_bloom == without
