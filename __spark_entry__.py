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
#: evidence.  Round 6 is the staleness rotation the r5 verdict asked
#: for: (a) the 8 round-6 queries never driver-sampled plus the
#: upgraded history_report, (b) queries whose plan/staging changed this
#: round (s1/s2/s5 cache re-key, tx_bpe_vocab invariant upgrade, new
#: s6_osm_export), then (c) the 41-query cohort whose latest driver row
#: is r4 — least-recently-sampled first.  Every query past position 50
#: has a green r4-r6 driver row and local parity coverage.
_DRIVER_PRIORITY = [
    # (a) never driver-sampled (added late r6) + the r6 invariant
    # upgrade of history_report (last driver row r4, rows-only)
    "emb_kmeans", "m11_asof_snapshot", "st_exact_dedup",
    "w4_range_frame", "j13_interval_join", "udf_expr_matchid",
    "g10_spatial_join", "dd_dup_spans_apply", "history_report",
    # (b) changed this round
    "s6_osm_export",  # OprOSMDataProvider reverse projection (new r7)
    "tx_bpe_vocab",  # rows-only -> closed-form oracle upgrade (r7)
    "tx_bpe_encode",  # X58 tokenizer application (new r7)
    "emb_hard_negatives",  # X59 hard-negative mining (new r7)
    "emb_rp_project",  # X60 J-L random projection (new r7)
    "g11_triangle_count",  # X61 triangle counting (new r7)
    "st_stream_join",  # X62 stream-stream interval join (new r7)
    "x63_compact_roundtrip",  # X63 small-file compaction (new r7)
    "tx_outlier_trim",  # X67 per-source quantile trim (new r7)
    "x64_bloom_prune",  # X64 bloom runtime join pruning (new r7)
    "x65_hierarchy_flatten",  # X65 pointer-doubling hierarchy (new r7)
    "x66_ewma_features",  # X66 time-decayed user features (new r7)
    "x69_ri_audit",  # X69 referential-integrity audit (new r7)
    "x68_event_transitions",  # X68 Markov transition matrix (new r7)
    "a11_pivot_matrix",  # A11 pivot long->wide reshape (new r7)
    "a12_unpivot_roundtrip",  # A12 unpivot wide->long melt (new r7)
    "st_enrich_join",  # X70 stream-static enrichment join (new r7)
    "sk_hll_distinct",  # SQL-reproducible HyperLogLog (new r7)
    "x71_scd2_build",  # SCD type-2 dimension build (new r7)
    "s18_format_roundtrip",  # CSV/JSON sink+source roundtrip (new r7)
    "sk_kmv_setops",  # theta-sketch union/intersection (new r7)
    "x72_gapfill_locf",  # hypertable gap-fill + LOCF (new r7)
    "x74_partition_prune",  # metadata-time partition pruning (new r7)
    "x75_smb_join",  # shuffle-free bucketed fact-fact join (new r7)
    "x76_dynamic_prune",  # runtime dynamic partition pruning (new r7)
    "sk_hll_rollup",  # sliced-and-merged HLL == direct build (new r7)
    "w5_rank_kit",  # full ranking-function surface, tie-heavy (new r7)
    "emb_pq_encode",  # product quantization, integer-exact (new r7)
    "tx_url_canon",  # URL canonicalization dedup kit (new r7)
    "sk_heavy_hitters",  # CMS-gated exact heavy hitters (new r7)
    "s19_osm_datasource",  # Python DataSource connector API (new r7)
    "sk_bottomk_rollup",  # sliced-and-merged bottom-k == direct (r7)
    "a13_agg_kit",  # count_if/bool_and/min_by surface (new r7)
    "dd_incremental",  # batch-vs-staged-index near-dup (new r7)
    "x81_scd2_asof",  # fact x SCD2 as-of lookup, invariant (new r7)
    "x82_bitmap_days",  # 64-bit bitmap-index set algebra (new r7)
    "g13_hex_bin",  # axial hex-grid spatial binning (new r7)
    "st_hll_distinct",  # streaming HLL register maintenance (new r7)
    "s1_osm_xml_roundtrip", "s5_staged_scan",  # staging re-keyed on
    "s2_diff_roundtrip",                       # source mtime+size
    # --- 50-slot cut line: everything below rolls to r8, lead with
    # these (local-parity-green only, no driver row yet) ---
    "x84_twap",  # integer-trapezoid time-weighted average (new r7)
    "o6_skyline",  # Pareto front via two-phase prefix max (new r7)
    "x85_event_paths",  # top journey 3-grams (new r7)
    "x86_merkle_diff",  # hash-range anti-entropy reconcile (new r7)
    "x87_window_dedup",  # watermark-expiry chained dedup (new r7)
    "x88_benford",  # first-digit distribution audit (new r7)
    "udtf_bigram_expand",  # Python UDTF + LATERAL surface (new r7)
    # (c) last sampled r4, oldest evidence in the repo
    "m9_apply_changelog", "m5_merge_ops", "m7_migrate_ids",
    "s14_pack_ops", "s15_merge_upsert", "s13_geojson_features",
    "s4_adaptive_split", "j3_border_correct", "j7_history_full_check",
    "p4_history_features", "p6_change_classification",
    "p7_review_candidates", "p11_json_extraction", "m8_placetype_ops",
    "a5_merge_counters", "a7_first_last_wins",
    "a8_rollup_status_priority", "a9_cube_flags", "a10_array_hof",
    "e2_config_delta", "e4_set_ops",
    # 50-slot budget EXACTLY spent: 9 in (a) + 38 in (b) + s1/s2/s5
    # (changed staging keys, need re-sampling) = 50.  The whole r4-green
    # cohort below rolls to r8 — new queries need FIRST driver evidence
    # more than r4-green ones need a refresh; r8 should lead with this
    # cohort plus any of this round's additions that missed the window
    "o4_topk_per_group", "o5_orthogonal_distance",
    "d2_monthly_windows", "w3_percentiles",
    "g4_simplify_ways", "g5_way_stats",
    "g6_points_in_triangle",
    "q6_revenue_delta", "q16_distinct_count", "q19_disjunctive_filter",
    "st_event_rollup", "st_sessionize", "st_user_totals",
    "tx_boilerplate", "tx_decontaminate", "tx_mix_weights",
    "tx_pii_scrub", "tx_repetition", "tx_stratified_sample",
    "tx_tfidf_topk",
    # r5/r6-green rotation (yield their slots; sampled when room allows)
    "q1_pricing_summary", "id_bytes_roundtrip", "d3_aligned_windows",
    "tx_pack_sequences", "dd_minhash_lsh", "dd_ngram_jaccard",
    "dd_dup_groups", "dd_apply", "a4_place_types", "tx_token_counts",
    "geo_tile_report", "emb_neardup_pairs", "j2_proximity_pairs",
    "d4_lenient_timestamps", "tx_domain_cap", "tx_group_split",
    "st_neardup_pairs", "x22_bucketed_lookup",
    "emb_semdedup", "j11_asof_join", "j12_range_join", "dd_blocks",
    "sk_kmv_distinct", "sk_countmin", "d5_multires_rollup",
    "sk_bottomk_quantiles", "tx_keyword_search", "mm_resize",
    "g7_zorder", "emb_scalar_quant", "tx_chunk_windows", "g8_zcell_scan",
    "tx_bigram_lm", "tx_classifier", "tx_weighted_sample",
    "tx_drift_report", "tx_shard_manifest", "sql_surface_report",
    "ev_funnel", "ev_retention", "ev_anomaly",
    "ann_quant_rerank", "dd_apply_best", "d6_incremental_rollup",
    "w2_event_deltas",
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
