"""Registry of all implemented queries + DuckDB oracles.

``__spark_entry__.py`` re-exports these; every SURVEY.md §2 row with a
query key lives here.  Convention: group keys are the string column
``key``; every computed column is aliased identically in the Spark
plan and the oracle SQL (driver hash-compares by column name).
"""

from goka_spark.queries import analytics, core, llmdata

# The driver's correctness run records exactly the first 50 registry
# entries and stops.  Rotate per round so no key's driver row goes
# >2 rounds stale.
_FRONT = [
    # Round 11 rotation (r10 verdict ask #1): close the certification
    # backlog completely.  Slots 1-22 = the last 22 never-certified
    # keys (21 oracle-bearing + the rows-only approx-distinct builtin
    # twin); slots 23-50 = the oldest r6-stale vintage.  After this
    # round every registry key has a driver CORRECTNESS row and the
    # oldest vintage is r6 on only 16 keys (queued first for r12).
    # All 50 were pre-verified at sf0.1 (one scale above the driver's
    # gate) before this rotation was staged, and re-verified at
    # sf0.01 this round before commit (tools/verify_local.py).
    # (a) the 22 never-certified keys
    "user_active_time",
    "seasonality_profile",
    "cohort_ltv_curve",
    "new_vs_returning",
    "source_domain_diversity",
    "hourly_session_concurrency",
    "weekly_growth",
    "token_burstiness",
    "vocab_coverage_curve",
    "type_mix_drift",
    "engagement_mix_by_decile",
    "error_impact",
    "daily_arpu",
    "readability_fre",
    "encoding_anomalies",
    "hapax_ratio",
    "gate_bias_by_length",
    "curriculum_phases",
    "image_contrast_score",
    "wav_headroom",
    "source_health_report",
    "approx_distinct_users_builtin",
    # (b) 28 r6-stale keys (oldest driver rows; several were
    # refactored since r6 — memoized pair-counts/gate-signal cores)
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ngram_jaccard_auto",
    "ngram_containment_pairs",
    "minhash_containment_est",
    "dup_span_extract",
    "dup_span_remove",
    "dedup_incremental",
    "bloom_decontaminate",
    "near_decontaminate",
    "blocklist_filter",
    "common_ngrams",
    "cluster_balanced_sample",
    "corpus_split",
    "corpus_shuffle",
    "corpus_domain_mix",
    "corpus_weighted_sample",
    "corpus_stats",
    "source_overlap_matrix",
    "doc_entropy",
    "decontaminate_spans",
    "decontaminate_span_remove",
    "nb_quality_classify",
    "vocab_coverage",
    "perplexity_buckets",
    "line_quality_filter",
    "proc_count_per_key",
    "proc_agg_state",
    # ---- 50-slot cap reached.  Best-effort tail: (c) the 16
    # remaining r6-stale keys so any extra driver slots refresh the
    # oldest rows first (these lead the r12 front).
    "bpe_token_count",
    "bpe_encode_docs",
    "lang_audit",
    "dedup_exact_prioritized",
    "image_dhash_dedup",
    "doc_lm_score",
    "corpus_importance_weights",
    "embedding_ivf_ann",
    "dedup_embedding_cosine",
    "dedup_semantic",
    "embedding_cluster_assign",
    "embedding_knn_graph",
    "embedding_pca_project",
    "doc_repetition",
    "embedding_pq_ann",
    "embedding_ivf_pq_ann",
    # (d) the r10-certified vintage (freshest rows; lowest priority)
    "seasonal_anomalies",
    "edit_distance_pairs",
    "lsh_vs_edit_eval",
    "stickiness_hll",
    "peak_concurrency",
    "image_wht_near_pairs",
    "lm_backoff_score",
    "lm_heldout_eval",
    "winnow_param_sweep",
    "dedup_deletion_audit",
    "user_activity_deciles",
    "revenue_gini",
    "activity_gini",
    "url_normalize",
    "url_domain_stats",
    "host_cap_sample",
    "dedup_url_keep",
    "session_funnel",
    "growth_accounting",
    # (b) remaining never-certified keys with non-trivial oracle
    # machinery (weighted minhash, interval weighting, path mining,
    # CC audits, PMI/chi2/correlation, ANN recall, bloom theory)
    "weighted_jaccard_pairs",
    "char_ngram_lang_id",
    "doc_lang_confidence",
    "dedup_savings_report",
    "ohlc_bars",
    "time_weighted_avg",
    "max_drawdown",
    "user_path_topk",
    "conversion_delay_buckets",
    "funnel_steps_timed",
    "activation_delay_buckets",
    "retention_triangle",
    "stickiness_dau_mau",
    "rfm_segments",
    "host_quality_report",
    "dedup_funnel_report",
    "volume_anomalies_robust",
    "event_cooccurrence_lift",
    "activation_correlates",
    "template_prefix_clusters",
    "skipgram_pmi_topk",
    "dup_cluster_source_purity",
    "sample_mix_chi2",
    "text_vs_embedding_consistency",
    "chain_merge_audit",
    "tokenizer_stability",
    "quantized_recall_eval",
    "dup_quality_compare",
    "bloom_fpr_calibration",
    "pii_audit_matrix",
    "session_depth_funnel",
]
# r12 rotation plan: front = section (c) — the 16 remaining r6-stale
# keys — then the r7 vintage (the next-oldest rows).  After r11 the
# never-certified count is 0, so rotation becomes pure vintage
# refresh and the registry freeze can lift (~25 new keys/round fits
# the 50-slot cap without re-growing the backlog).



def _ordered(merged: dict) -> dict:
    out = {k: merged[k] for k in _FRONT if k in merged}
    out.update(merged)
    return out


def all_queries():
    q = {}
    q.update(core.QUERIES)
    q.update(analytics.QUERIES)
    q.update(llmdata.QUERIES)
    return _ordered(q)


def all_oracles():
    o = {}
    o.update(core.ORACLES)
    o.update(analytics.ORACLES)
    o.update(llmdata.ORACLES)
    # callables are lazy oracle builders (data-derived literals, e.g.
    # the IVF centroid twin) — resolve them when the driver asks
    o = {k: (v() if callable(v) else v) for k, v in o.items()}
    return _ordered(o)
