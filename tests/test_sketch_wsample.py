"""Weighted-sample sketch (deterministic priority sampling) properties:
exact mergeability on sketch ROWS, scan-order purity, exactness for
small groups, the estimator contract, and the weight-domain guard."""

import pytest
import pyspark.sql.functions as F

from pulsar_io_delta_spark.operators import sketch as sk
from pulsar_io_delta_spark.tables import table


def _docs(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    return d.select(
        "lang",
        "source",
        "doc_id",
        F.greatest(F.lit(1), F.least(F.col("n_chars"), F.lit(sk.WMAX_WEIGHT)))
        .cast("long")
        .alias("wt"),
    )


def test_wsample_merge_equals_rebuild(spark, sf_dir):
    """Mergeability on the SKETCH ROWS, not just the estimates —
    bottom-(k+1) of the union of per-shard bottom-(k+1)'s is the
    bottom-(k+1) of the union, exactly, so a rollup store's incremental
    state equals the batch rebuild."""
    d = _docs(spark, sf_dir)
    a = d.where(F.col("doc_id") % 2 == 0)
    b = d.where(F.col("doc_id") % 2 == 1)
    ska = sk.wsample_sketch(a, "lang", "wt", "doc_id")
    skb = sk.wsample_sketch(b, "lang", "wt", "doc_id")
    merged = sk.wsample_merge(ska, skb, "lang")
    rebuilt = sk.wsample_sketch(d, "lang", "wt", "doc_id")
    assert merged.exceptAll(rebuilt).count() == 0
    assert rebuilt.exceptAll(merged).count() == 0


def test_wsample_sketch_is_pure_function_of_data(spark, sf_dir):
    """Determinism under partitioning — u1 comes from the row key's
    hash, priorities are integers, and ties break on (r, u1, v), so the
    sketch of the same data is identical whatever the layout (the
    property float-u Efraimidis–Spirakis sampling lacks)."""
    d = _docs(spark, sf_dir)
    s1 = sk.wsample_sketch(d, "lang", "wt", "doc_id")
    s2 = sk.wsample_sketch(d.repartition(7, "doc_id"), "lang", "wt", "doc_id")
    assert s1.exceptAll(s2).count() == 0
    assert s2.exceptAll(s1).count() == 0


def test_wsample_small_group_estimate_is_exact(spark):
    """A group holding ≤ k rows has no threshold row, so the estimator
    degrades to the exact weight sum — the τ-absent branch."""
    rows = [("g", i, (i % 9) + 1) for i in range(sk.WK_DEFAULT)]
    df = spark.createDataFrame(rows, "lang string, doc_id long, wt long")
    est = sk.wsample_estimate(
        sk.wsample_sketch(df, "lang", "wt", "doc_id"), "lang"
    ).collect()[0]
    assert est.sample_k == sk.WK_DEFAULT
    assert est.est_total_w == sum((i % 9) + 1 for i in range(sk.WK_DEFAULT))


def test_wsample_estimate_within_contract(spark, sf_dir):
    """The gate contract: every per-language estimate within
    WERR_PM/1000 of the exact total (~4x the k=64 standard error), and
    the threshold path actually exercised (some group > k rows)."""
    d = _docs(spark, sf_dir)
    est = sk.wsample_estimate(sk.wsample_sketch(d, "lang", "wt", "doc_id"), "lang")
    exact = d.groupBy("lang").agg(F.sum("wt").alias("xw"))
    rows = est.join(exact, "lang").collect()
    assert rows
    for r in rows:
        assert abs(r.est_total_w - r.xw) * 1000 <= sk.WERR_PM * r.xw, r
    sizes = {r.lang: r.n for r in d.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert max(sizes.values()) > sk.WK_DEFAULT, "threshold path not exercised"


def test_wsample_weight_domain_guard_raises(spark):
    """Out-of-domain weights must fail LOUDLY at execution: w < 1 has
    no priority and w > WMAX_WEIGHT would overflow the estimate
    arithmetic — silent clamping would bias the sample."""
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    for bad_w in (0, sk.WMAX_WEIGHT + 1):
        df = spark.createDataFrame(
            [("g", 1, bad_w)], "lang string, doc_id long, wt long"
        )
        with pytest.raises(SparkRuntimeException, match="wsample"):
            sk.wsample_sketch(df, "lang", "wt", "doc_id").collect()


def test_wsample_heavier_items_sampled_more(spark):
    """Statistical sanity of weight-proportionality: the sample's mean
    weight must exceed the population's mean weight (heavy items win
    the priority race more often). Crafted 5000-row group, weights
    1..100 — expected sample mean ≈ E[w²]/E[w] ≈ 67 vs population 50.5."""
    rows = [("g", i, (i % 100) + 1) for i in range(5000)]
    df = spark.createDataFrame(rows, "lang string, doc_id long, wt long")
    skw = sk.wsample_sketch(df, "lang", "wt", "doc_id")
    samp_mean = skw.agg(F.avg("w")).collect()[0][0]
    pop_mean = df.agg(F.avg("wt")).collect()[0][0]
    assert samp_mean > pop_mean * 1.15, (samp_mean, pop_mean)


def test_wsample_threshold_boundary_and_independent_replay(spark):
    """Group with EXACTLY k+1 rows — the smallest input where the
    threshold path fires: the sketch keeps all k+1 rows, the sample is
    the first k in priority order, and the estimate must equal an
    INDEPENDENT pure-Python replay of the Duffield–Lund–Thorup
    arithmetic computed from Spark's own xxhash64 values (the
    independent-trainer pattern tests/test_llm_ops.py uses for BPE)."""
    import pyspark.sql.functions as FF

    n = sk.WK_DEFAULT + 1
    rows = [("g", 1000 + i, (i * 37) % 100 + 1) for i in range(n)]
    df = spark.createDataFrame(rows, "lang string, doc_id long, wt long")

    # independent replay: fetch the engine's hash values, then do the
    # whole priority/threshold/estimate arithmetic in plain Python
    hs = {
        r.doc_id: r.h
        for r in df.select(
            "doc_id", FF.xxhash64("doc_id").alias("h")
        ).collect()
    }
    items = []
    for _, did, wt in rows:
        u1 = hs[did] % sk.WU_MOD + 1
        r = (u1 * sk.WS_SCALE) // wt
        items.append((r, u1, did, wt))
    items.sort()  # (r, u1, v) total order; ids unique
    sample, (rt, u1_t, _, w_t) = items[: sk.WK_DEFAULT], items[sk.WK_DEFAULT]
    est_py = sum(max(wt * u1_t, w_t * sk.WU_MOD) for _, _, _, wt in sample) // u1_t

    got = sk.wsample_estimate(
        sk.wsample_sketch(df, "lang", "wt", "doc_id"), "lang"
    ).collect()[0]
    assert got.sample_k == sk.WK_DEFAULT
    assert got.est_total_w == est_py


# ---- r16: subset-sum application primitives (q_corpus_mix) ----

def test_subset_sum_partitions_the_total_estimate(spark, sf_dir):
    """Per-label subset sums use the identical max(w·u1_t, w_t·2^32)
    terms as the total estimator, split by label before the one div —
    so Σ_label est_w can undershoot the group estimate by at most one
    unit per label (floor once per label vs once total), never more,
    and never overshoot."""
    from pulsar_io_delta_spark.queries.pipeline3 import _wsample_weighted_docs

    d = _wsample_weighted_docs(spark, sf_dir)
    sketch = sk.wsample_sketch(d, "lang", "wt", "doc_id")
    total = {
        r.lang: r.est_total_w for r in sk.wsample_estimate(sketch, "lang").collect()
    }
    rows = sk.wsample_sample_rows(sketch, "lang")
    labeled = d.select(F.col("doc_id").alias("v"), "source").join(rows, "v")
    per = sk.wsample_subset_sum(labeled, "lang", ["source"]).collect()
    by_lang = {}
    nlabels = {}
    for r in per:
        by_lang[r.lang] = by_lang.get(r.lang, 0) + r.est_w
        nlabels[r.lang] = nlabels.get(r.lang, 0) + 1
    assert set(by_lang) == set(total)
    for lang, s in by_lang.items():
        assert total[lang] - nlabels[lang] < s <= total[lang], (lang, s, total[lang])


def test_subset_sum_exact_path_without_threshold(spark):
    """A group holding ≤ k rows has no threshold: every label's
    estimate must be that label's EXACT weight sum."""
    data = [("g", f"d{i}", (i % 7) + 1, "s" + str(i % 3)) for i in range(20)]
    df = spark.createDataFrame(data, "lang string, doc_id string, wt long, source string")
    sketch = sk.wsample_sketch(df, "lang", "wt", "doc_id")
    rows = sk.wsample_sample_rows(sketch, "lang")
    labeled = df.select(F.col("doc_id").alias("v"), "source").join(rows, "v")
    got = {
        (r.lang, r.source): (r.sample_rows, r.est_w)
        for r in sk.wsample_subset_sum(labeled, "lang", ["source"]).collect()
    }
    import collections
    want = collections.defaultdict(lambda: [0, 0])
    for _, _, wt, src in data:
        want[("g", src)][0] += 1
        want[("g", src)][1] += wt
    assert got == {k: tuple(v) for k, v in want.items()}
