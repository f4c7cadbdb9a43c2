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
    """The driver samples the first 50 registrations. Final round-6
    composition: every query the driver has NEVER sampled (the 30+
    added this round) holds a slot, plus the contract-rewritten
    queries (TF-IDF document-frequency rewrite, IVF recall / HLL
    error-bound contracts) and the two r4-oracled evidence holes.
    Driver-proven unmodified blocks rotate behind — the judge gate
    re-verifies all 175 at three scales every run regardless."""
    window = set(list(entry_mod.queries())[:50])
    must_be_in = {
        "q_stream_tumbling",  # canary (dsum user)
        # r4-oracled, zero post-oracle driver rows
        "q_multimodal_decode", "q_text_fingerprint",
        # contract/code changed this round
        "q_tfidf_topterms", "q_sim_ann_ivf", "q_agg_approx",
        # zero driver history: mid-round batch
        "q_stream_late_data", "q_dedup_cc", "q_source_orc", "q_scd2_dim",
        "q_stream_enrich", "q_fuzzy_pairs", "q_bm25_topdocs", "q_ewma",
        "q_anomaly_zscore", "q_hampel_filter", "q_markov_transitions",
        "q_profile_stats", "q_dedup_incremental", "q_dedup_keep_best",
        "q_stratified_sample", "q_time_rollup_multires", "q_join_bucketed",
        "q_agg_approx_quantiles", "q_stream_join_outer",
        # zero driver history: late batch
        "q_lm_score", "q_mixture_sample", "q_shard_assign",
        "q_snapshot_diff", "q_zorder_scan", "q_winsorize",
        "q_source_binary", "q_restore", "q_stream_cdc", "q_pit_join",
        "q_pagerank", "q_curation_pipeline", "q_bitwise_funcs",
        "q_hash_funcs", "q_geohash", "q_geo_join", "q_sketch_countmin",
        "q_source_logs", "q_json_typed", "q_table_detail",
        "q_interval_join", "q_multimodal_audio", "q_multimodal_video",
        "q_multimodal_resize",
    }
    assert must_be_in <= window, sorted(must_be_in - window)


def test_no_rows_only_queries_remain():
    """Round 6 closed the last two rows-only waivers (IVF recall and
    HLL error-bound contracts): every registered query now carries a
    DuckDB oracle."""
    qs, osql = entry_mod.queries(), entry_mod.oracle_sql()
    assert set(qs) - set(osql) == set()
