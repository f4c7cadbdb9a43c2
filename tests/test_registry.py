"""Driver-contract invariants."""

import __spark_entry__ as entry_mod


def test_contract_shape():
    qs = entry_mod.queries()
    osql = entry_mod.oracle_sql()
    assert len(qs) >= 50
    assert set(osql) <= set(qs)
    assert all(callable(f) for f in qs.values())
    assert all(isinstance(s, str) and "SELECT" in s.upper() for s in osql.values())


def test_entry_runs(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns


def test_round6_window_composition():
    """The driver samples the first 50 registrations: the round-6
    rotation must hold (a) the two r4-oracled queries that never got a
    post-oracle driver row, (b) every query whose code or contract
    changed this round (TF-IDF rewrite, new contracts, late-data
    query, funnel/entropy/dsum rewrites), and (c) the stalest r4-green
    blocks (guards against accidental re-ordering)."""
    window = list(entry_mod.queries())[:50]
    must_be_in = {
        # canary (also a dsum user)
        "q_stream_tumbling",
        # (a) evidence holes closed this round
        "q_multimodal_decode", "q_text_fingerprint",
        # (b) changed this round
        "q_tfidf_topterms", "q_sim_ann_ivf", "q_agg_approx",
        "q_stream_late_data", "q_funnel", "q_text_entropy",
        "q_agg_groupby", "q_agg_distinct", "q_agg_rollup", "q_agg_cube",
        "q_agg_variance", "q_join_broadcast", "q_window_running",
        "q_window_range_frame", "q_timeseries_gapfill",
        "q_join_skew_salted", "q_stream_sliding",
        # (c) two-rounds-stale r4 greens. Zero-driver-history queries
        # always outrank stale greens for window slots: the late-round
        # additions displaced first the TPC-H singles, then (pipeline3)
        # the merge/wire/snapshot/type-widening/schema-evolution block —
        # all r4-green, unmodified, judge-gate green on current
        # fixtures, lowest re-check value.
        # (most r4-green dedup singles rotated just behind the window
        # edge as the late additions took their slots — zero-history
        # queries outrank stale greens; q_bitwise_funcs/q_hash_funcs,
        # trivial scalar contracts, deliberately registered BEHIND the
        # window so the semantically richer zero-history queries keep
        # their slots)
        # pipeline3 additions (zero driver history)
        "q_lm_score", "q_mixture_sample", "q_shard_assign",
        "q_snapshot_diff", "q_zorder_scan", "q_winsorize",
        "q_source_binary", "q_restore", "q_stream_cdc", "q_pit_join",
        "q_pagerank", "q_curation_pipeline",

        # new round-6 queries (all with zero driver history)
        "q_join_bucketed", "q_agg_approx_quantiles", "q_stream_join_outer",
        "q_time_rollup_multires", "q_stratified_sample",
        "q_dedup_cc", "q_source_orc", "q_scd2_dim", "q_stream_enrich",
        "q_fuzzy_pairs", "q_bm25_topdocs", "q_ewma", "q_anomaly_zscore",
        "q_hampel_filter", "q_markov_transitions", "q_profile_stats",
        "q_dedup_incremental", "q_dedup_keep_best",
    }
    assert must_be_in <= set(window), sorted(must_be_in - set(window))


def test_no_rows_only_queries_remain():
    """Round 6 closed the last two rows-only waivers (IVF recall and
    HLL error-bound contracts): every registered query now carries a
    DuckDB oracle."""
    qs, osql = entry_mod.queries(), entry_mod.oracle_sql()
    assert set(qs) - set(osql) == set()
