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
    # Round 10 rotation (r9 verdict ask #1): all 50 slots go to
    # never-certified r9 keys — 72 keys have never had a driver row
    # (+76 registry growth in r9 vs the 50-slot cap).  Highest-risk
    # first: the ops with novel oracle machinery the verdict named
    # explicitly, then the rest of the never-certified set.  All 50
    # are locally oracle-verified at sf0.01 before this rotation was
    # committed (tools/verify_local.py).
    # (a) verdict-named novel-oracle ops
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
    # ---- 50-slot cap reached.  Best-effort tail: (c) the 22
    # never-certified keys that queue for r11 (simple agg shapes;
    # all locally oracle-verified), then (d) the 44 r6-stale keys so
    # any extra driver slots refresh the oldest rows first.
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
    # (d) r6-stale keys (oldest driver rows in the registry)
    "proc_count_per_key",
    "proc_agg_state",
    "doc_entropy",
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
    "dedup_incremental",
    "bloom_decontaminate",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ngram_jaccard_auto",
    "ngram_containment_pairs",
    "minhash_containment_est",
    "dup_span_extract",
    "dup_span_remove",
    "decontaminate_spans",
    "decontaminate_span_remove",
    "nb_quality_classify",
    "vocab_coverage",
    "perplexity_buckets",
    "line_quality_filter",
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
]
# r11 rotation plan: promote (c) — the 22 remaining never-certified
# keys — into the front, then fill the rest of the 50 slots from (d),
# the r6-stale vintage.  After r11 every key has a driver row and
# nothing is older than r8.



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
