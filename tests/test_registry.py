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


def test_round5_window_composition():
    """The driver samples the first 50 registrations: the round-5
    rotation must keep (a) the events-ts-fix cluster, (b) the
    zero-driver-history queries, and (c) this round's new operators
    inside that window (guards against accidental re-ordering)."""
    window = list(entry_mod.queries())[:50]
    must_be_in = {
        # canary + events-ts fix cluster
        "q_stream_tumbling", "q_stream_sliding", "q_stream_session",
        "q_stream_stream_join", "q_stream_watermark_dedup",
        "q_cdc_envelope", "q_partition_encode", "q_hash_route",
        "q_time_travel_filter", "q_cdc_source", "q_json_funcs",
        "q_map_funcs", "q_source_csv", "q_source_jsonl",
        "q_timeseries_gapfill", "q_asof_join",
        # zero driver-row history before round 5
        "q_sql_tpch_q1", "q_sql_tpch_q6", "q_sql_tpch_q10",
        "q_sql_tpch_q14", "q_sql_tpch_q18", "q_sql_tpch_q19",
        "q_multimodal_real_decode", "q_sim_ann_lsh",
        # new round-5 operators
        "q_sessionize", "q_funnel", "q_text_entropy",
        "q_emb_centroid", "q_emb_quantize",
        "q_chunk_docs", "q_tfidf_topterms", "q_retention_cohort",
        "q_sql_sessionize", "q_sql_funnel",
    }
    assert must_be_in <= set(window), sorted(must_be_in - set(window))


def test_rows_only_set_is_exactly_the_justified_two():
    qs, osql = entry_mod.queries(), entry_mod.oracle_sql()
    assert set(qs) - set(osql) == {"q_agg_approx", "q_sim_ann_ivf"}
