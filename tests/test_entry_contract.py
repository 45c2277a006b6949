"""Driver-contract shape of __spark_entry__: the gate the driver actually
calls. Cheap insurance that a refactor never breaks the entry surface."""

from __future__ import annotations

import sys


def test_entry_contract_shape():
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as e

    qs = e.queries()
    oracles = e.oracle_sql()
    assert len(qs) >= 70
    assert set(oracles) <= set(qs)  # every oracle belongs to a query
    assert len(oracles) >= 68
    assert all(callable(f) for f in qs.values())
    assert all(isinstance(v, str) and v.strip() for v in oracles.values())
    # every registry entry is oracle-backed as of r11: the last rows-only
    # entry (rag_pipeline — nondeterministic limit() knowledge base) was
    # retired in favour of its hash-verified twins rag_pipeline_verified
    # and rag_pipeline_bulk (VERDICT r10 #8). Additions to the rows-only
    # set must be conscious decisions, not accidents.
    rows_only = set(qs) - set(oracles)
    assert rows_only == set(), rows_only
    # the driver checks the FIRST 50 entries; the tail is the deliberate
    # out-of-window set. Round 11 rotated the window again (VERDICT r10
    # #2): the 13 late-r10 additions that had never been in an external
    # driver window occupy the front with the re-encoded context_windows
    # (scalar ctx columns, VERDICT r10 #1) and the ten NEW r11
    # entries (ann_hamming / mmr_rerank / knn_hubness / hamming_recall_eval
    # / mmr_diversity_eval / semantic_decontaminate / knn_hubness_ivf / quantile_normalize / md_structure / jpeg_decode_stats — new work goes
    # straight into the window so it cannot re-open the external-
    # evidence ledger); the rest is r10-hash-green
    # ballast (canonical known-good lines rag_pipeline_verified /
    # tpch_q1 / ann_topk plus the heaviest non-trivial r10 chains).
    # Every tail entry below was externally hash-checked in at least one
    # r1-r10 driver window. All further changes are gated here.
    assert list(qs)[50:] == [
        # r12 interim: image_neardup + dhash_recall_eval entered the
        # window on addition (header rule), displacing the two entries
        # below to the tail head; the full r12 stale-evidence rotation
        # (VERDICT r11 #4) happens later this round
        "wav_decode_stats",  # externally checked r11; displaced by the r12 additions
        "simhash_recall_eval",  # externally checked r11; displaced by the r12 additions
        "ddl_reference_pipeline",  # externally checked r11; displaced by the r12 additions
        "source_overlap",  # externally checked r10; rotated out mid-r11 (slot handed to the r11 additions)
        "ngram_novelty",  # externally checked r10; rotated out mid-r11 (slot handed to the r11 additions)
        "event_rate_anomaly",  # externally checked r10; rotated out mid-r11 (slot handed to the r11 additions)
        "group_moments",  # externally checked r10; rotated out mid-r11 (slot handed to the r11 eval additions)
        "spend_concentration",  # externally checked r10; rotated out mid-r11 (slot handed to the r11 eval additions)
        "quantization_error",  # externally checked r10; rotated out mid-r11 (slot handed to semantic_decontaminate)
        "langid_eval",  # externally checked r10; rotated out mid-r11 (slot handed to knn_hubness_ivf)
        "cumulative_distinct",  # externally checked r10; rotated out mid-r11 (slot handed to quantile_normalize)
        "oov_rate",  # externally checked r10; rotated out mid-r11 (slot handed to md_structure)
        "theil_sen_trend",  # externally checked r10; rotated out mid-r11 (slot handed to jpeg_decode_stats)
        "char_entropy",  # externally checked r10; rotated out r11 (slot handed to the late-r10 pack)
        "attribution",  # externally checked r10; rotated out r11 (slot handed to the late-r10 pack)
        "png_meta",  # externally checked r10; rotated out r11 (slot handed to the late-r10 pack)
        "rank_normalize",  # externally checked r10; rotated out r11 (slot handed to the late-r10 pack)
        "temporal_enrich",  # externally checked r10; rotated out r11 (slot handed to the late-r10 pack)
        "group_quantiles",  # externally checked r10; rotated out r11 (slot handed to the late-r10 pack)
        "session_stats",  # externally checked r10; rotated out r11 (slot handed to the late-r10 pack)
        "shard_balance",  # externally checked r10; rotated out r11 (slot handed to the late-r10 pack)
        "pack_efficiency",  # externally checked r10; rotated out r11 (slot handed to the late-r10 pack)
        "k_anonymity",  # externally checked r10; rotated out r11 (slot handed to the late-r10 pack)
        "grid_density",  # externally checked r10; rotated out r11 (slot handed to the late-r10 pack)
        "ab_lift",  # externally checked r10; rotated out r11 (slot handed to the late-r10 pack)
        "funnel_latency",  # externally checked r10; rotated out r11 (slot handed to the late-r10 pack)
        "mad_outliers",  # externally checked r9; rotated out late r10 (slot handed to the r10 late pack)
        "centroid_shift",  # externally checked r9; rotated out late r10 (slot handed to the r10 late pack)
        "semantic_dedup",  # externally checked r9; rotated out late r10 (slot handed to the r10 late pack)
        "cluster_sample",  # externally checked r9; rotated out late r10 (slot handed to the r10 late pack)
        "kmeans_refine",  # externally checked r9; rotated out late r10 (slot handed to the r10 late pack)
        "bloom_join",  # externally checked r9; rotated out late r10 (slot handed to the r10 late pack)
        "heavy_hitters",  # externally checked r9; rotated out late r10 (slot handed to the r10 late pack)
        "incremental_neardup",  # externally checked r9; rotated out late r10 (slot handed to the r10 late pack)
        "kcore",  # externally checked r9; rotated out late r10 (slot handed to the r10 late pack)
        "bfs_hops",  # externally checked r9; rotated out r10 (slot handed to ddl_reference_pipeline)
        "setsim_join",  # externally checked r9; rotated out r10 (slot handed to jpeg_meta)
        "containment_pairs",  # externally checked r9; rotated out r10 (slot handed to knn_classify_ivf)
        "skew_profile",  # externally checked r9; rotated out r10
        "join_blowup",  # externally checked r9; rotated out r10
        "pmi_collocations",  # externally checked r9; rotated out r10
        "frequent_pairs",  # externally checked r9; rotated out r10
        "lsh_recall_eval",  # externally checked r9; rotated out r10
        "term_drift",  # externally checked r9; rotated out r10
        "zipf_slope",  # externally checked r9; rotated out r10
        "mutual_info",  # externally checked r9; rotated out r10
        "interarrival_stats",  # externally checked r9; rotated out r10
        "embedding_norms",  # externally checked r9; rotated out r10
        "bitmap_distinct",  # externally checked r9; rotated out r10
        "grouping_sets_revenue",  # externally checked r9; rotated out r10
        "ivm_aggregate",  # externally checked r9; rotated out r10
        "snapshot_diff",  # externally checked r9; rotated out r10
        "cooc_window",  # externally checked r9; rotated out r10
        "ohlc_bars",  # externally checked r9; rotated out r10
        "band_join",  # externally checked r9; rotated out r10
        "normalized_dedup",  # externally checked r9; rotated out r10
        "hdr_quantiles",  # externally checked r9; rotated out r10
        "budget_select",  # externally checked r9; rotated out r10
        "gap_fill",  # externally checked r9; rotated out r10
        "linear_trend",  # externally checked r9; rotated out r10
        "winsorize",  # externally checked r9; rotated out r10
        "value_histogram",  # externally checked r9; rotated out r10
        "unpivot_types",  # externally checked r9; rotated out r10
        "cohort_retention",  # externally checked r9; rotated out r10
        "decayed_score",  # externally checked r9; rotated out r10
        "profile_columns",  # externally checked r9; rotated out r10
        "fuzzy_dedup",  # externally checked r1-r8; rotated out late r9
        "curation_v2",  # externally checked r1-r8; rotated out late r9
        "contrastive_pairs",  # externally checked r1-r8; rotated out late r9
        "rag_pipeline_bulk",  # externally checked r1-r8; rotated out late r9
        "chunk_embed_ingest",  # externally checked r1-r8; rotated out late r9
        "bpe_merges",  # externally checked r1-r8; rotated out late r9
        "ngram_jaccard",  # externally checked r1-r8; rotated out late r9
        "tpch_q9",  # externally checked r1-r8; rotated out late r9
        "mask_spans",  # externally checked r1-r8; rotated out late r9
        "tpch_q2",  # externally checked r7-r8
        "tpch_q8",  # externally checked r7-r8
        "tpch_q11",  # externally checked r7-r8
        "tpch_q13",  # externally checked r7-r8
        "tpch_q16",  # externally checked r7-r8
        "tpch_q17",  # externally checked r7-r8
        "tpch_q20",  # externally checked r7-r8
        "tpch_q21",  # externally checked r7-r8
        "bucketed_join",  # externally checked r7-r8
        "tpch_q4",  # externally checked r7-r8
        "tpch_q7",  # externally checked r7-r8
        "tpch_q10",  # externally checked r7-r8
        "tpch_q12",  # externally checked r7-r8
        "tpch_q14",  # externally checked r7-r8
        "tpch_q15",  # externally checked r7-r8
        "tpch_q18",  # externally checked r7-r8
        "tpch_q19",  # externally checked r7-r8
        "tpch_q22",  # externally checked r7-r8
        "global_row_number",  # externally checked r7-r8
        "sessionize",  # externally checked r7-r8
        "tfidf_vectors",  # externally checked r7-r8
        "ann_recall_eval",  # externally checked r7-r8
        "ann_pq",  # externally checked r7-r8
        "ann_ivfpq",  # externally checked r7-r8
        "ann_quantized",  # externally checked r7-r8
        "random_projection",  # externally checked r7-r8
        "ann_projected",  # externally checked r7-r8
        "rerank_topk",  # externally checked r7-r8
        "lm_score",  # externally checked r7-r8
        "dup_clusters",  # externally checked r7-r8
        "funnel_match",  # externally checked r7-r8
        "leakage_split",  # externally checked r7-r8
        "range_rolling",  # externally checked r7-r8
        "above_user_avg",  # externally checked r7-r8
        "tiered_sample",  # externally checked r7-r8
        "pivot_by_type",  # externally checked r7-r8
        "hopping_window",  # externally checked r7-r8
        "label_centroids",  # externally checked r7-r8
        "cdc_apply",  # externally checked r7-r8
        "argmax_per_user",  # externally checked r7-r8
        "weighted_sample",  # externally checked r7-r8
        "asof_snapshot",  # externally checked r7-r8
        "transition_matrix",  # externally checked r7-r8
        "equidepth_histogram",  # externally checked r7-r8
        "keyword_trigger",  # externally checked r1-r6
        "cache_hit_join",  # externally checked r1-r6
        "explode_chunks",  # externally checked r1-r6
        "topn_per_user",  # externally checked r1-r6
        "recent_history",  # externally checked r1-r6
        "session_window",  # externally checked r1-r6
        "tpch_q3",  # externally checked r1-r6
        "tpch_q5",  # externally checked r1-r6
        "tpch_q6",  # externally checked r1-r6
        "join_revenue_by_nation",  # externally checked r1-r6
        "cube_revenue",  # externally checked r1-r6
        "window_analytics",  # externally checked r1-r6
        "interval_join",  # externally checked r1-r6
        "scd2_history",  # externally checked r1-r6
        "dedup_exact",  # externally checked r1-r6
        "lsh_pairs",  # externally checked r1-r6
        "simhash_pairs",  # externally checked r1-r6
        "embedding_lsh_pairs",  # externally checked r1-r6
        "neardup_dedup",  # externally checked r1-r6
        "dup_spans",  # externally checked r1-r6
        "span_pairs",  # externally checked r1-r6
        "decontaminate",  # externally checked r1-r6
        "edit_distance_pairs",  # externally checked r1-r6
        "ann_ivf_topk",  # externally checked r1-r6
        "bm25_topk",  # externally checked r1-r6
        "hybrid_rrf",  # externally checked r1-r6
        "lang_id",  # externally checked r1-r6
        "quality_filter",  # externally checked r1-r6
        "repetition_scores",  # externally checked r1-r6
        "lm_bigram_score",  # externally checked r1-r6
        "countmin_sketch",  # externally checked r1-r6
        "hll_vocab",  # externally checked r1-r6
        "kmv_overlap",  # externally checked r1-r6
        "zorder_key",  # externally checked r1-r6
        "triangle_count",  # externally checked r1-r6
        "pagerank",  # externally checked r1-r6
        "multimodal_features",  # externally checked r1-r6
        "mixture_sample",  # externally checked r1-r6
        "curation_pipeline",  # externally checked r1-r6
        "pii_redact",  # externally checked r1-r6
        "pack_sequences",  # externally checked r1-r6
        "ddl_ctas_topn",  # externally checked r1-r6
        "ddl_struct_array",  # externally checked r1-r6
        "filter_route",  # externally checked r1-r6
        "case_dispatch",  # externally checked r1-r6
        "null_guard",  # externally checked r1-r6
        "path_extract",  # externally checked r1-r6
        "set_ops",  # externally checked r1-r6
        "json_cleanup_extract",  # externally checked r1-r6
        "top_terms",  # externally checked r1-r6
        "length_percentiles",  # externally checked r1-r6
        "line_dedup",  # externally checked r1-r6
        "fingerprint",  # externally checked r1-r6
        "dedup_keep_best",  # externally checked r1-r6
        "asof_join",  # externally checked r1-r6
        "rollup_revenue",  # externally checked r1-r6
        "tumbling_window",  # externally checked r1-r6
        "concat_prompt",  # externally checked r1-r6
        "array_ops",  # externally checked r1-r6
        "rag_retrieval",  # externally checked r1-r6
        "multimodal_meta",  # externally checked r1-r6
        "minhash_signatures",  # externally checked r1-r6
        "simhash",  # externally checked r1-r6
        "order_limit",  # externally checked r1-r6
        "window_running_sum",  # externally checked r1-r6
        "anti_join",  # externally checked r1-r6
        "embedding_cosine_pairs",  # externally checked r1-r6
        "salted_join",  # externally checked r1-r6
        "vocab_size",  # externally checked r1-r6
        "deterministic_split",  # externally checked r1-r6
        "stratified_sample",  # externally checked r1-r6
        "quality_score",  # externally checked r1-r6
        "token_stats",  # externally checked r1-r6
    ]
    assert all(oracles.get(n) for n in list(qs)[:50])  # window is 100% oracle-backed


def test_out_of_window_oracles_stay_green(spark):
    """The driver never verifies entries past #50, so the subsumption claims
    for the out-of-window oracle-backed entries could silently drift — run
    the full gate (rows + schema + dtype drift + values vs DuckDB) for
    exactly those entries at sf0.001 on every pytest run (ADVICE r4)."""
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as e
    from tools.check_correctness import check_entries

    qs, oracles = e.queries(), e.oracle_sql()
    tail_oracle_backed = [n for n in list(qs)[50:] if n in oracles]
    assert tail_oracle_backed  # the set exists by construction
    failures = check_entries(spark, "/root/testdata/sf0.001", tail_oracle_backed)
    assert not failures, failures
