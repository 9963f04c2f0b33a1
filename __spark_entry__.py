"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` maps
every implemented operator (SURVEY.md §2 + corpus-curation extensions) to
a ``(spark, sf_dir) -> DataFrame`` callable; ``oracle_sql()`` holds the
DuckDB-equivalent SQL for each, hash-compared by the driver at sf0.01.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from openplacereviews_db_spark.plans import (corpus, events_analytics,
                                             graph, history, merge_plans,
                                             oplog, pipeline, places_reports,
                                             relational, relational2, scoring,
                                             sketches, sync_plans, temporal)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return relational.q1_pricing_summary(spark, "/root/testdata/sf0.001")


#: The driver samples the FIRST 50 ``queries()`` entries per round, so
#: insertion order decides which queries get driver-grade correctness
#: evidence.  Round 11 executes the r10 verdict's rotation plan:
#: (a) the 7 queries whose latest driver row is r6 — the oldest
#: evidence left in the contract — lead; (b) this round's plan
#: changes: j2_proximity_pairs / g11_triangle_count gained the
#: density-constant per-100k-id longitude-box grid (values unchanged
#: at driver scales — block 0 — but re-verified); (c) 41 of the 47
#: r7-stale queries — after r11 no query's evidence predates r7, and
#: the 5 deferred (trivial relational-kit plans, below the cut) lead
#: the r12 rotation.
_DRIVER_PRIORITY = [
    # (a) the 7 queries whose latest driver evidence was r6 — the
    # oldest in the contract after r10 (all trivial pure-column plans,
    # deferred at r10's 50-cut; r10 verdict item 1)
    "d1_date_kit", "t1_text_kit", "w1_running_total", "p10_name_tags",
    "p12_mercator_tiles", "g3_tile_grid", "p2_main_element",
    # (b) r11 plan changes: the j2/g11 synthetic point grid is now
    # density-constant across decades (per-100k-id longitude boxes) —
    # values unchanged at driver scales (block 0), re-verified anyway.
    "j2_proximity_pairs", "g11_triangle_count",
    # (b2) the r11 inline-verify redesign of minhash_lsh_pairs (exact
    # Jaccard moved into the band self-join; values identical, plan
    # reshaped) — every consumer of the shared function gets fresh
    # driver evidence the round the plan changed
    "dd_minhash_lsh", "dd_dup_groups", "dd_apply", "dd_apply_best",
    "tx_group_split",
    # (c) r7-stale cohort, 36 of 47 (next-stalest; heavy kernels and
    # streaming first; 5 trivial relational-kit plans plus the 5
    # displaced by block b2 lead the r12 rotation below the cut)
    "emb_kmeans", "m11_asof_snapshot", "st_exact_dedup", "j13_interval_join",
    "udf_expr_matchid", "g10_spatial_join", "dd_dup_spans_apply",
    "history_report", "s6_osm_export", "tx_bpe_vocab", "tx_bpe_encode",
    "emb_hard_negatives", "emb_rp_project", "st_stream_join",
    "x63_compact_roundtrip", "tx_outlier_trim", "x64_bloom_prune",
    "x65_hierarchy_flatten", "x66_ewma_features", "x69_ri_audit",
    "x68_event_transitions", "st_enrich_join", "sk_hll_distinct",
    "x71_scd2_build", "sk_kmv_setops", "x72_gapfill_locf",
    "x74_partition_prune", "x75_smb_join", "x76_dynamic_prune",
    "sk_hll_rollup", "emb_pq_encode", "s19_osm_datasource",
    "sk_bottomk_rollup", "dd_incremental", "x81_scd2_asof",
    "x82_bitmap_days",
    # --- 50-slot cut line: 7 + 2 + 5 + 36 = 50.  r12 leads with the
    # ten r7-stale queries below (5 displaced by block b2 + the 5
    # relational-kit plans deferred at the original cut).
    "g13_hex_bin", "st_hll_distinct",
    "s1_osm_xml_roundtrip", "s5_staged_scan", "s2_diff_roundtrip",
    "w4_range_frame", "w5_rank_kit", "a13_agg_kit", "a11_pivot_matrix",
    "a12_unpivot_roundtrip",
    # r10/r9/r8-green blocks (freshest evidence — yield their slots)
    "id_bytes_roundtrip", "tx_token_counts", "tx_keyword_search",
    "w2_event_deltas", "a4_place_types", "d3_aligned_windows", "dd_simhash",
    "dd_simhash_pairs", "tx_fingerprints", "st_neardup_pairs", "dd_exact",
    "dd_containment", "dd_dup_spans", "emb_neardup_lsh", "ann_cosine_topk",
    "ann_knn_label", "ann_ivf_topk", "curate_corpus", "g2_proximity_groups",
    "g9_pagerank", "g1_sessionize", "j1_argmax_join", "j4_match_cascade",
    "j4_fuzzy_name_join", "j5_pick_merges", "j6_anti_join", "j7_semi_join",
    "j10_latest_event", "m6_close_report", "m1m4_sync_ops",
    "m10_tripadvisor_ops", "e1_snapshot_diff", "e9_extract_diff",
    "e3_intersect_keys", "mm_decode_stats", "mm_feature_codes",
    "mm_sample_frames", "tx_language_id", "tx_quality_score", "tx_bm25",
    "a1_area_summary", "a2_images_size", "geoall_area_summary",
    "p2_main_osm_element", "o1_distance_topk", "q3_segment_topk",
    "q5_region_revenue", "s7_keys_scan", "s9_inverse_index_lookup",
    "s17_schema_evolution", "st_scd2_upsert", "s20_orc_roundtrip",
    "x77_salted_join", "p13_variant_kit", "s21_corrupt_quarantine",
    "g15_border_zone", "mm_phash_dedup", "x92_retract_rollup",
    "s18_format_roundtrip", "tx_url_canon", "mm_phash_groups",
    "dd_ngram_jaccard", "dd_blocks", "emb_neardup_pairs",
    "emb_semdedup", "emb_scalar_quant", "ann_quant_rerank", "mm_resize",
    "q1_pricing_summary", "geo_tile_report", "sql_surface_report",
    "j11_asof_join", "j12_range_join", "x22_bucketed_lookup", "g7_zorder",
    "g8_zcell_scan", "sk_kmv_distinct", "sk_countmin",
    "sk_bottomk_quantiles", "ev_funnel", "ev_retention", "ev_anomaly",
    "d4_lenient_timestamps", "d5_multires_rollup", "d6_incremental_rollup",
    "tx_pack_sequences", "tx_domain_cap", "tx_chunk_windows", "tx_bigram_lm",
    "tx_classifier", "tx_weighted_sample", "tx_drift_report",
    "tx_shard_manifest", "x84_twap", "o6_skyline", "x85_event_paths",
    "x86_merkle_diff", "x87_window_dedup", "x88_benford",
    "udtf_bigram_expand", "m12_fixture_verdicts", "sk_heavy_hitters",
    "m9_apply_changelog", "m5_merge_ops", "m7_migrate_ids", "s14_pack_ops",
    "s15_merge_upsert", "s13_geojson_features", "s4_adaptive_split",
    "j3_border_correct", "j7_history_full_check", "p4_history_features",
    "p6_change_classification", "p7_review_candidates",
    "p11_json_extraction", "m8_placetype_ops", "a5_merge_counters",
    "a7_first_last_wins", "a8_rollup_status_priority", "a9_cube_flags",
    "a10_array_hof", "e2_config_delta", "e4_set_ops", "o4_topk_per_group",
    "o5_orthogonal_distance", "d2_monthly_windows", "w3_percentiles",
    "g4_simplify_ways", "g5_way_stats", "g6_points_in_triangle",
    "q6_revenue_delta", "q16_distinct_count", "q19_disjunctive_filter",
    "st_event_rollup", "st_sessionize", "st_user_totals", "tx_boilerplate",
    "tx_decontaminate", "tx_mix_weights", "tx_pii_scrub", "tx_repetition",
    "tx_stratified_sample", "tx_tfidf_topk",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    merged: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    merged.update(relational.QUERIES)
    merged.update(corpus.QUERIES)
    merged.update(oplog.QUERIES)
    merged.update(places_reports.QUERIES)
    merged.update(merge_plans.QUERIES)
    merged.update(relational2.QUERIES)
    merged.update(history.QUERIES)
    merged.update(sync_plans.QUERIES)
    merged.update(pipeline.QUERIES)
    merged.update(temporal.QUERIES)
    merged.update(sketches.QUERIES)
    merged.update(scoring.QUERIES)
    merged.update(graph.QUERIES)
    merged.update(events_analytics.QUERIES)
    out = {n: merged[n] for n in _DRIVER_PRIORITY if n in merged}
    out.update(merged)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    out.update(relational.ORACLES)
    out.update(corpus.ORACLES)
    out.update(oplog.ORACLES)
    out.update(places_reports.ORACLES)
    out.update(merge_plans.ORACLES)
    out.update(relational2.ORACLES)
    out.update(history.ORACLES)
    out.update(sync_plans.ORACLES)
    out.update(pipeline.ORACLES)
    out.update(temporal.ORACLES)
    out.update(sketches.ORACLES)
    out.update(scoring.ORACLES)
    out.update(graph.ORACLES)
    out.update(events_analytics.ORACLES)
    return out
