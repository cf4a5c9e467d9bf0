"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Query ids follow SURVEY.md §2's operator inventory; implementations live in
``boletia_kubernetes_kafka_mongodb_spark/``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from boletia_kubernetes_kafka_mongodb_spark.operators import (
    aggregates,
    cdc,
    dedup,
    graph,
    joins,
    multimodal,
    ordering,
    sampling,
    mutations,
    notifications,
    scans,
    search,
    similarity,
    text,
)
from boletia_kubernetes_kafka_mongodb_spark.streaming import admission, windows


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: J4 availability join on sf0.001 (SURVEY.md §7 Phase 0)."""
    return joins.join_availability(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Ordering note: the driver records only the FIRST 50 entries in dict
    order per round. Round-14 window (the standing rotation rule): the
    FULL r11 cohort — the 49 ids whose latest attestation is round 11 in
    the cross-round histogram (r11: 49, r12: 50, r13: 50) — plus
    ``ext_dedup_minhash_accuracy`` from the r12 cohort, because the r13
    verdict (#6) ordered every semantics-adjacent r13 rewrite into the
    r14 attestation window: ext_heavy_hitters, ext_dedup_substring,
    agg_retention_cohorts, ext_text_bigram_logprob,
    ext_decontaminate_bloom (all r11 cohort, covered by the rotation)
    and ext_dedup_minhash_accuracy (r12, the one manual pick). After r14
    the histogram is r12: 49, r13: 50, r14: 50 — no id older than
    round 12.
    """
    return {
        # --- r14 window positions 1-50: the full r11 cohort (every id
        # whose latest attestation is round 11, 49 ids, sorted) plus
        # ext_dedup_minhash_accuracy (r12 cohort; the one r14-verdict
        # semantics-adjacent rewrite not already inside the cohort) ---
        "agg_anomaly_zscore": aggregates.agg_anomaly_zscore,
        "agg_cube_source_lang": aggregates.agg_cube_source_lang,
        "agg_funnel_stages": aggregates.agg_funnel_stages,
        "agg_retention_cohorts": aggregates.agg_retention_cohorts,
        "agg_value_histogram": aggregates.agg_value_histogram,
        "cdc_broker_metrics": cdc.cdc_broker_metrics,
        "ext_ann_ivf_batch": similarity.ext_ann_ivf_batch,
        "ext_ann_ivf_topk": similarity.ext_ann_ivf_topk,
        "ext_ann_lsh_topk": similarity.ext_ann_lsh_topk,
        "ext_approx_quantiles_incremental": aggregates.ext_approx_quantiles_incremental,
        "ext_approx_quantiles_sketch": aggregates.ext_approx_quantiles_sketch,
        "ext_bm25_search": search.ext_bm25_search,
        "ext_cooccurrence": aggregates.ext_cooccurrence,
        "ext_corpus_budget_select": sampling.ext_corpus_budget_select,
        "ext_corpus_stats": text.ext_corpus_stats,
        "ext_decontaminate": sampling.ext_decontaminate,
        "ext_decontaminate_bloom": sampling.ext_decontaminate_bloom,
        "ext_dedup_clusters": dedup.ext_dedup_clusters,
        "ext_dedup_incremental": dedup.ext_dedup_incremental,
        "ext_dedup_segments": dedup.ext_dedup_segments,
        "ext_dedup_simhash": dedup.ext_dedup_simhash,
        "ext_dedup_substring": dedup.ext_dedup_substring,
        "ext_heavy_hitters": text.ext_heavy_hitters,
        "ext_multimodal_dedup": multimodal.ext_multimodal_dedup,
        "ext_multimodal_features": multimodal.ext_multimodal_features,
        "ext_multimodal_framesample": multimodal.ext_multimodal_framesample,
        "ext_multimodal_meta": multimodal.ext_multimodal_meta,
        "ext_multimodal_phash": multimodal.ext_multimodal_phash,
        "ext_quality_buckets": text.ext_quality_buckets,
        "ext_sample_importance": sampling.ext_sample_importance,
        "ext_sample_quota": sampling.ext_sample_quota,
        "ext_sample_split": sampling.ext_sample_split,
        "ext_sample_weighted": sampling.ext_sample_weighted,
        "ext_shard_manifest": sampling.ext_shard_manifest,
        "ext_split_drift": sampling.ext_split_drift,
        "ext_split_leakage_safe": sampling.ext_split_leakage_safe,
        "ext_text_bigram_logprob": text.ext_text_bigram_logprob,
        "ext_text_clean": dedup.ext_text_clean,
        "ext_text_entropy": text.ext_text_entropy,
        "ext_text_fingerprint": text.ext_text_fingerprint,
        "ext_text_langid": text.ext_text_langid,
        "ext_text_pii_mask": text.ext_text_pii_mask,
        "ext_text_quality": text.ext_text_quality,
        "ext_text_repetition": text.ext_text_repetition,
        "ext_text_sentiment": text.ext_text_sentiment,
        "ext_text_tokens": text.ext_text_tokens,
        "ext_text_winnowing": text.ext_text_winnowing,
        "ext_tfidf_terms": search.ext_tfidf_terms,
        "ext_vocab_coverage": text.ext_vocab_coverage,
        "ext_dedup_minhash_accuracy": dedup.ext_dedup_minhash_accuracy,
        # --- position > 50 from here: green r12/r13 driver rows,
        # output-unchanged this round (sorted for auditability) ---
        "agg_count_reservations": aggregates.agg_count_reservations,
        "agg_ewma_daily": aggregates.agg_ewma_daily,
        "agg_latency_bands": aggregates.agg_latency_bands,
        "agg_pivot_estado": aggregates.agg_pivot_estado,
        "agg_rollup_category": aggregates.agg_rollup_category,
        "agg_running_capacity": aggregates.agg_running_capacity,
        "agg_sessionize": aggregates.agg_sessionize,
        "agg_sliding_window": aggregates.agg_sliding_window,
        "agg_time_window": windows.agg_time_window,
        "agg_unpivot_estado": aggregates.agg_unpivot_estado,
        "agg_user_stickiness": aggregates.agg_user_stickiness,
        "agg_value_quantiles": aggregates.agg_value_quantiles,
        "cancel_increment": mutations.cancel_increment,
        "cascade_cancel_updateall": mutations.cascade_cancel_updateall,
        "cdc_route_messages": cdc.cdc_route_messages,
        "cdc_scd2_history": cdc.cdc_scd2_history,
        "event_cancel_update": mutations.event_cancel_update,
        "ext_ann_index_promote": similarity.ext_ann_index_promote,
        "ext_ann_index_refresh": similarity.ext_ann_index_refresh,
        "ext_ann_ivfpq_topk": similarity.ext_ann_ivfpq_topk,
        "ext_ann_ndcg_audit": similarity.ext_ann_ndcg_audit,
        "ext_ann_pq_topk": similarity.ext_ann_pq_topk,
        "ext_ann_recall_audit": similarity.ext_ann_recall_audit,
        "ext_approx_distinct": aggregates.ext_approx_distinct,
        "ext_approx_distinct_kmv": aggregates.ext_approx_distinct_kmv,
        "ext_asof_join": joins.ext_asof_join,
        "ext_bpe_merges": text.ext_bpe_merges,
        "ext_bpe_vocab_sweep": text.ext_bpe_vocab_sweep,
        "ext_corpus_keep_list": sampling.ext_corpus_keep_list,
        "ext_dedup_containment": dedup.ext_dedup_containment,
        "ext_dedup_edit_distance": dedup.ext_dedup_edit_distance,
        "ext_dedup_embedding": dedup.ext_dedup_embedding,
        "ext_dedup_exact": dedup.ext_dedup_exact,
        "ext_dedup_incremental_near": dedup.ext_dedup_incremental_near,
        "ext_dedup_minhash_lsh": dedup.ext_dedup_minhash_lsh,
        "ext_dedup_ngram_jaccard": dedup.ext_dedup_ngram_jaccard,
        "ext_dedup_semantic_clusters": dedup.ext_dedup_semantic_clusters,
        "ext_distinct_users_exact": aggregates.ext_distinct_users_exact,
        "ext_embed_drift": similarity.ext_embed_drift,
        "ext_embed_project": similarity.ext_embed_project,
        "ext_embed_quantize": similarity.ext_embed_quantize,
        "ext_entity_resolution": dedup.ext_entity_resolution,
        "ext_freq_countmin": text.ext_freq_countmin,
        "ext_graph_label_prop": graph.ext_graph_label_prop,
        "ext_graph_pagerank": graph.ext_graph_pagerank,
        "ext_graph_survivor_rank": graph.ext_graph_survivor_rank,
        "ext_hybrid_search_rrf": search.ext_hybrid_search_rrf,
        "ext_kmeans_assign_counts": similarity.ext_kmeans_assign_counts,
        "ext_kmeans_embeddings": similarity.ext_kmeans_embeddings,
        "ext_kmv_set_ops": aggregates.ext_kmv_set_ops,
        "ext_knn_label_transfer": similarity.ext_knn_label_transfer,
        "ext_mmr_diversify": similarity.ext_mmr_diversify,
        "ext_multimodal_resize": multimodal.ext_multimodal_resize,
        "ext_ngram_novelty": dedup.ext_ngram_novelty,
        "ext_percolate_match": search.ext_percolate_match,
        "ext_quality_calibration": text.ext_quality_calibration,
        "ext_quality_classifier": text.ext_quality_classifier,
        "ext_quality_psi": text.ext_quality_psi,
        "ext_quality_threshold": text.ext_quality_threshold,
        "ext_range_join": joins.ext_range_join,
        "ext_sample_chunks": sampling.ext_sample_chunks,
        "ext_sample_mixture": sampling.ext_sample_mixture,
        "ext_sample_pack": sampling.ext_sample_pack,
        "ext_semdedup": similarity.ext_semdedup,
        "ext_text_readability": text.ext_text_readability,
        "ext_text_unigram_logprob": text.ext_text_unigram_logprob,
        "ext_tokenizer_apply": text.ext_tokenizer_apply,
        "ext_tokenizer_fertility": text.ext_tokenizer_fertility,
        "ext_tokenizer_oov": text.ext_tokenizer_oov,
        "ext_topk_batch": similarity.ext_topk_batch,
        "ext_topk_similarity": similarity.ext_topk_similarity,
        "ext_vocab_topk": text.ext_vocab_topk,
        "filter_compound_eq": scans.filter_compound_eq,
        "filter_range_guard": scans.filter_range_guard,
        "filter_state_machine": cdc.filter_state_machine,
        "fn_json_props_extract": cdc.fn_json_props_extract,
        "insert_dedup_unique": mutations.insert_dedup_unique,
        "join_attribution": joins.join_attribution,
        "join_availability": joins.join_availability,
        "join_availability_bucketed": joins.join_availability_bucketed,
        "join_cancel_inventory": joins.join_cancel_inventory,
        "join_cascade": joins.join_cascade,
        "join_exists_anti": joins.join_exists_anti,
        "lookup_pk": scans.lookup_pk,
        "lookup_point_unique": scans.lookup_point_unique,
        "notify_render": notifications.notify_render,
        "order_latest_per_email": ordering.order_latest_per_email,
        "order_page_keyset": ordering.order_page_keyset,
        "order_topn_disponible": ordering.order_topn_disponible,
        "order_user_event_ranks": ordering.order_user_event_ranks,
        "project_rename_detreserva": scans.project_rename_detreserva,
        "reserva_cancel_flag": mutations.reserva_cancel_flag,
        "reserve_admission_exact": admission.admission_ledger_batch,
        "reserve_guarded_decrement": mutations.reserve_guarded_decrement,
        "scan_full_eventos": scans.scan_full_eventos,
        "scan_full_inventario": scans.scan_full_inventario,
        "setop_churn_emails": ordering.setop_churn_emails,
        "sink_upsert_clone": cdc.sink_upsert_clone,
        "sql_availability": scans.sql_availability,
    }


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query id (same parquet views)."""
    return {
        "scan_full_eventos": scans.scan_full_eventos_oracle(),
        "scan_full_inventario": scans.scan_full_inventario_oracle(),
        "lookup_point_unique": scans.lookup_point_unique_oracle(),
        "lookup_pk": scans.lookup_pk_oracle(),
        "filter_compound_eq": scans.filter_compound_eq_oracle(),
        "filter_range_guard": scans.filter_range_guard_oracle(),
        "filter_state_machine": cdc.filter_state_machine_oracle(),
        "project_rename_detreserva": scans.project_rename_detreserva_oracle(),
        "sql_availability": joins.join_availability_oracle(),
        "reserve_guarded_decrement": mutations.reserve_guarded_decrement_oracle(),
        "cancel_increment": mutations.cancel_increment_oracle(),
        "event_cancel_update": mutations.event_cancel_update_oracle(),
        "cascade_cancel_updateall": mutations.cascade_cancel_updateall_oracle(),
        "reserva_cancel_flag": mutations.reserva_cancel_flag_oracle(),
        "insert_dedup_unique": mutations.insert_dedup_unique_oracle(),
        "reserve_admission_exact": admission.admission_oracle_sql(),
        "join_cancel_inventory": joins.join_cancel_inventory_oracle(),
        "join_exists_anti": joins.join_exists_anti_oracle(),
        "join_cascade": joins.join_cascade_oracle(),
        "join_availability": joins.join_availability_oracle(),
        "join_availability_bucketed": joins.join_availability_bucketed_oracle(),
        "ext_kmeans_assign_counts": similarity.ext_kmeans_assign_counts_oracle(),
        "ext_asof_join": joins.ext_asof_join_oracle(),
        "ext_range_join": joins.ext_range_join_oracle(),
        "agg_running_capacity": aggregates.agg_running_capacity_oracle(),
        "agg_count_reservations": aggregates.agg_count_reservations_oracle(),
        "order_topn_disponible": ordering.order_topn_disponible_oracle(),
        "order_latest_per_email": ordering.order_latest_per_email_oracle(),
        "setop_churn_emails": ordering.setop_churn_emails_oracle(),
        "order_user_event_ranks": ordering.order_user_event_ranks_oracle(),
        "sink_upsert_clone": cdc.sink_upsert_clone_oracle(),
        "notify_render": notifications.notify_render_oracle(),
        "cdc_route_messages": cdc.cdc_route_messages_oracle(),
        "fn_json_props_extract": cdc.fn_json_props_extract_oracle(),
        "agg_time_window": windows.agg_time_window_oracle(),
        "agg_sessionize": aggregates.agg_sessionize_oracle(),
        "agg_value_quantiles": aggregates.agg_value_quantiles_oracle(),
        "agg_sliding_window": aggregates.agg_sliding_window_oracle(),
        "agg_rollup_category": aggregates.agg_rollup_category_oracle(),
        "agg_pivot_estado": aggregates.agg_pivot_estado_oracle(),
        "agg_unpivot_estado": aggregates.agg_unpivot_estado_oracle(),
        "ext_distinct_users_exact": aggregates.ext_distinct_users_exact_oracle(),
        # round 5: KMV bottom-k distinct — md5-derived hashes + IEEE double
        # normalization make the whole sketch engine-deterministic
        "ext_approx_distinct_kmv": aggregates.ext_approx_distinct_kmv_oracle(),
        # round 5: split-by-component — clusters CTE chain composed with
        # the md5 split CASE (shared _sql_clusters_ctes builder)
        "ext_split_leakage_safe": sampling.ext_split_leakage_safe_oracle(),
        # round 5: batched IVF — the single-query CTE program with the
        # query dimension kept (same sims frame ranks every probe list)
        "ext_ann_ivf_batch": similarity.ext_ann_ivf_batch_oracle(),
        # round 5: budget selection — oracle states the naive ordered-
        # cumsum rule the tier decomposition must reproduce exactly
        "ext_corpus_budget_select": sampling.ext_corpus_budget_select_oracle(),
        # round 6: length-band blocked edit-distance pairs — banding is
        # lossless (|Δlen| ≤ max-dist ⇒ band delta ≤ 1), so the oracle is
        # the same blocked join; levenshtein is exact on both engines
        "ext_dedup_edit_distance": dedup.ext_dedup_edit_distance_oracle(),
        # round 6: integer nano-rank power iteration — all-BIGINT state
        # makes the recursive-CTE replay exact at every iteration
        "ext_graph_pagerank": graph.ext_graph_pagerank_oracle(),
        # round 6: mergeable-sketch set algebra — same engine-independent
        # sketch CTEs as the KMV id, pairwise merge + ρ-estimator
        "ext_kmv_set_ops": aggregates.ext_kmv_set_ops_oracle(),
        "ext_text_readability": text.ext_text_readability_oracle(),
        # round 6: same shingle family + md5-64 keys on both engines —
        # parity unconditional even under (astronomically rare) collisions
        "ext_ngram_novelty": dedup.ext_ngram_novelty_oracle(),
        # round 6: md5-derived ±1 matrix as plain literals on both engines;
        # identical left-fold order makes every coordinate bit-equal
        "ext_embed_project": similarity.ext_embed_project_oracle(),
        # round 6: recursive CTE carries the 5 weights; BIGINT-quantized
        # per-row gradient terms make the batch sum order-independent
        "ext_quality_classifier": text.ext_quality_classifier_oracle(),
        # round 6: the recursive CTE reads the working table twice
        # (previous labels + votes) — legal in DuckDB, replays every round
        "ext_graph_label_prop": graph.ext_graph_label_prop_oracle(),
        # round 6: TWO recursive CTE chains (components + pagerank) under
        # one WITH RECURSIVE, sharing one edge list
        "ext_graph_survivor_rank": graph.ext_graph_survivor_rank_oracle(),
        # round 6: calibration bins composed onto the shared fit CTEs —
        # score·1e6 recovers integers, so bin means are exact BIGINT sums
        "ext_quality_calibration": text.ext_quality_calibration_oracle(),
        # round 7: threshold selection composed onto the same fit CTEs
        "ext_quality_threshold": text.ext_quality_threshold_oracle(),
        # round 8: PSI drift monitor composed onto the same fit CTEs —
        # deterministic-ln series, BIGINT-quantized bin contributions
        "ext_quality_psi": text.ext_quality_psi_oracle(),
        # round 7: the two batch ANN CTE programs composed — recall@k
        "ext_ann_recall_audit": similarity.ext_ann_recall_audit_oracle(),
        # round 8: deterministic bottom-K row-sample quantile sketch —
        # md5 row hashes + the same interpolated percentile as the exact id
        "ext_approx_quantiles_sketch": aggregates.ext_approx_quantiles_sketch_oracle(),
        # round 8: the sketch CTE program × (standing, batch, merged) —
        # incremental update + percentile shifts
        "ext_approx_quantiles_incremental": aggregates.ext_approx_quantiles_incremental_oracle(),
        # round 9 (staged r8): Count-Min cells are md5-bucket groupBy
        # sums — engine-deterministic including collisions → full oracle
        "ext_freq_countmin": text.ext_freq_countmin_oracle(),
        # round 9 (staged r8): fertility audit replays the BPE fit CTEs;
        # BIGINT sums + one IEEE-exact division per metric
        "ext_tokenizer_fertility": text.ext_tokenizer_fertility_oracle(),
        # round 6: est (signature agreement) and exact (shingle jaccard)
        # are both engine-independent — the audit carries a full oracle
        "ext_dedup_minhash_accuracy": dedup.ext_dedup_minhash_accuracy_oracle(),
        "agg_user_stickiness": aggregates.agg_user_stickiness_oracle(),
        # extensions with exact SQL oracles
        "ext_dedup_exact": dedup.ext_dedup_exact_oracle(),
        "ext_dedup_ngram_jaccard": dedup.ext_dedup_ngram_jaccard_oracle(),
        "ext_dedup_containment": dedup.ext_dedup_containment_oracle(),
        "ext_dedup_clusters": dedup.ext_dedup_clusters_oracle(),
        "ext_dedup_embedding": dedup.ext_dedup_embedding_oracle(),
        "ext_dedup_semantic_clusters": dedup.ext_dedup_semantic_clusters_oracle(),
        "ext_knn_label_transfer": similarity.ext_knn_label_transfer_oracle(),
        "ext_vocab_topk": text.ext_vocab_topk_oracle(),
        "ext_text_unigram_logprob": text.ext_text_unigram_logprob_oracle(),
        "ext_corpus_keep_list": sampling.ext_corpus_keep_list_oracle(),
        "ext_topk_similarity": similarity.ext_topk_similarity_oracle(),
        "ext_topk_batch": similarity.ext_topk_batch_oracle(),
        "ext_text_tokens": text.ext_text_tokens_oracle(),
        "ext_text_langid": text.ext_text_langid_oracle(),
        "ext_text_quality": text.ext_text_quality_oracle(),
        "ext_text_fingerprint": text.ext_text_fingerprint_oracle(),
        "ext_text_winnowing": text.ext_text_winnowing_oracle(),
        "ext_bpe_merges": text.ext_bpe_merges_oracle(),
        "ext_tokenizer_apply": text.ext_tokenizer_apply_oracle(),
        "ext_text_repetition": text.ext_text_repetition_oracle(),
        "ext_text_pii_mask": text.ext_text_pii_mask_oracle(),
        "ext_corpus_stats": text.ext_corpus_stats_oracle(),
        "ext_text_sentiment": text.ext_text_sentiment_oracle(),
        "ext_multimodal_meta": multimodal.ext_multimodal_meta_oracle(),
        "ext_multimodal_features": multimodal.ext_multimodal_features_oracle(),
        "ext_multimodal_resize": multimodal.ext_multimodal_resize_oracle(),
        "ext_multimodal_framesample": multimodal.ext_multimodal_framesample_oracle(),
        "ext_sample_split": sampling.ext_sample_split_oracle(),
        "ext_sample_quota": sampling.ext_sample_quota_oracle(),
        "ext_decontaminate": sampling.ext_decontaminate_oracle(),
        "ext_sample_mixture": sampling.ext_sample_mixture_oracle(),
        "ext_sample_chunks": sampling.ext_sample_chunks_oracle(),
        "ext_sample_pack": sampling.ext_sample_pack_oracle(),
        "ext_dedup_segments": dedup.ext_dedup_segments_oracle(),
        "ext_split_drift": sampling.ext_split_drift_oracle(),
        "ext_decontaminate_bloom": sampling.ext_decontaminate_bloom_oracle(),
        "ext_sample_weighted": sampling.ext_sample_weighted_oracle(),
        "ext_embed_quantize": similarity.ext_embed_quantize_oracle(),
        "ext_dedup_incremental": dedup.ext_dedup_incremental_oracle(),
        "ext_quality_buckets": text.ext_quality_buckets_oracle(),
        "ext_text_entropy": text.ext_text_entropy_oracle(),
        "ext_vocab_coverage": text.ext_vocab_coverage_oracle(),
        "agg_funnel_stages": aggregates.agg_funnel_stages_oracle(),
        "agg_retention_cohorts": aggregates.agg_retention_cohorts_oracle(),
        "agg_value_histogram": aggregates.agg_value_histogram_oracle(),
        "ext_heavy_hitters": text.ext_heavy_hitters_oracle(),
        "ext_bm25_search": search.ext_bm25_search_oracle(),
        "ext_tfidf_terms": search.ext_tfidf_terms_oracle(),
        "agg_anomaly_zscore": aggregates.agg_anomaly_zscore_oracle(),
        "ext_cooccurrence": aggregates.ext_cooccurrence_oracle(),
        "ext_dedup_substring": dedup.ext_dedup_substring_oracle(),
        "ext_text_clean": dedup.ext_text_clean_oracle(),
        "ext_sample_importance": sampling.ext_sample_importance_oracle(),
        "ext_text_bigram_logprob": text.ext_text_bigram_logprob_oracle(),
        "cdc_broker_metrics": cdc.cdc_broker_metrics_oracle(),
        "ext_shard_manifest": sampling.ext_shard_manifest_oracle(),
        "join_attribution": joins.join_attribution_oracle(),
        "ext_entity_resolution": dedup.ext_entity_resolution_oracle(),
        "ext_hybrid_search_rrf": search.ext_hybrid_search_rrf_oracle(),
        "cdc_scd2_history": cdc.cdc_scd2_history_oracle(),
        "agg_latency_bands": aggregates.agg_latency_bands_oracle(),
        "agg_cube_source_lang": aggregates.agg_cube_source_lang_oracle(),
        "agg_ewma_daily": aggregates.agg_ewma_daily_oracle(),
        "ext_percolate_match": search.ext_percolate_match_oracle(),
        "order_page_keyset": ordering.order_page_keyset_oracle(),
        "ext_mmr_diversify": similarity.ext_mmr_diversify_oracle(),
        "ext_multimodal_dedup": multimodal.ext_multimodal_dedup_oracle(),
        # round 3: the SRP pipeline is md5-derived (engine-independent), so
        # the LSH ANN id gained a full DuckDB oracle
        "ext_ann_lsh_topk": similarity.ext_ann_lsh_topk_oracle(),
        # round 3: IVF assignment rounds similarities to 6dp before argmax on
        # both engines, making the whole probe deterministic cross-engine
        "ext_ann_ivf_topk": similarity.ext_ann_ivf_topk_oracle(),
        # round 3: 6dp rounding of distances + per-iteration centroid means
        # makes the Lloyd fit itself engine-deterministic (recursive CTE
        # carries the centroid list as state)
        "ext_kmeans_embeddings": similarity.ext_kmeans_embeddings_oracle(),
        # round 3: deterministic assignments + 6dp-rounded pairwise sims make
        # the greedy prune exactly re-derivable (recursive kept-list CTE)
        "ext_semdedup": similarity.ext_semdedup_oracle(),
        # round 3: PQ training/encode/ADC all round at 6dp on both engines
        "ext_ann_pq_topk": similarity.ext_ann_pq_topk_oracle(),
        # round 4: IVF probe × PQ ADC composed — both stages deterministic,
        # so the oracle is the composition of the two existing CTE programs
        "ext_ann_ivfpq_topk": similarity.ext_ann_ivfpq_topk_oracle(),
        # round 3: md5-derived token hashes make the whole SimHash pipeline
        # engine-deterministic (integer votes, banding, chunk-wise hamming)
        "ext_dedup_simhash": dedup.ext_dedup_simhash_oracle(),
        # round 3: integer-exact aHash threshold; lossless banding => the
        # oracle checks all pairs directly
        "ext_multimodal_phash": multimodal.ext_multimodal_phash_oracle(),
        # round 3: engine-independent MinHash family (md5 base hash +
        # universal-hash permutations + polynomial band fold)
        "ext_dedup_minhash_lsh": dedup.ext_dedup_minhash_lsh_oracle(),
        "ext_dedup_incremental_near": dedup.ext_dedup_incremental_near_oracle(),
        # round 9: the last rows-only id closed — the HLL estimate itself
        # is engine-private, but the GUARANTEE is not: each engine checks
        # its own sketch against the same exact count with an all-BIGINT
        # tolerance band, so the driver hash-gates |est−exact|/exact ≤ ε.
        "ext_approx_distinct": aggregates.ext_approx_distinct_oracle(),
        # round 10 (staged r9): held-out OOV audit — BPE fit on the
        # train+val split only, audited per language on the unseen split
        "ext_tokenizer_oov": text.ext_tokenizer_oov_oracle(),
        # round 10 (staged r9): merge-count ablation — the recursive BPE
        # CTE retains every intermediate rank, so the encode CTE read at
        # rank k IS the k-merge tokenizer; one fit serves every point
        "ext_bpe_vocab_sweep": text.ext_bpe_vocab_sweep_oracle(),
        # round 10 (staged r9): K-cell cluster-share PSI per hash split —
        # deterministic k-means assignment + the text monitor's PSI core
        "ext_embed_drift": similarity.ext_embed_drift_oracle(),
        # round 10 (staged r9): NDCG@k of the IVF batch serve — the k
        # rank discounts quantized to BIGINT nano-units once in python
        # and embedded as integer literals in BOTH engines' programs
        "ext_ann_ndcg_audit": similarity.ext_ann_ndcg_audit_oracle(),
        # round 10 (NEW): the refreshed physical layout must agree with
        # the declarative statement of what a rebuild under the frozen
        # standing-corpus quantizer would hold — per-list split counts
        "ext_ann_index_refresh": similarity.ext_ann_index_refresh_oracle(),
        # round 12 (NEW): staged recall-gated index promotion — the oracle
        # re-derives both candidate quantizers, nearest/farthest
        # assignments, the pruned-serve recall@k, the integer
        # promote/reject decision, and the post-decision committed
        # manifest the physical index must have left behind
        "ext_ann_index_promote": similarity.ext_ann_index_promote_oracle(),
    }
