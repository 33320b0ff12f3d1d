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
    # Round 12 rotation (r11 verdict asks #1 + #2).  The registry is
    # fully certified (268/268 after r11), so rotation is now pure
    # vintage refresh plus freeze-lift growth:
    #   slots 1-2   = the 2 r4-vintage rows-only keys (oldest rows in
    #                 the CORRECTNESS file);
    #   slots 3-18  = the 16 r6-stale keys (pre-verified at sf0.1 on
    #                 the r11 tree before this rotation was staged);
    #   slots 19-25 = the 7 oldest r7-vintage keys;
    #   slots 26-50 = this round's NEW keys (freeze lifted per the
    #                 r11 verdict), each landed only after
    #                 sf0.001+sf0.01 oracle verification; r7-vintage
    #                 keys fill any slot a new key hasn't taken yet.
    # (a) r4 rows-only pair
    "emitter_roundtrip",
    "changelog_compaction",
    # (b) the 16 r6-stale keys
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
    # (c) the 7 oldest r7-vintage keys
    "proc_latest_n",
    "proc_fold_generic",
    "stream_table_join",
    "stream_lookup_join",
    "output_stream",
    "proc_headers_native",
    "ngram_jaccard_prefix",
    # (d) NEW r12 keys (inserted here as they are built + verified)
    "ccnet_paragraph_dedup",
    "paragraph_prune_text",
    "winnow_split_contamination",
    "domain_quality_drift",
    "msttr_lexical_diversity",
    "doc_lang_mix",
    "corpus_stopword_profile",
    "numeric_token_profile",
    "source_minhash_sim",
    "vocab_jaccard_sources",
    "embedding_centroid_shift",
    "embedding_label_silhouette",
    "quality_gate_venn",
    "user_event_entropy",
    "interarrival_burstiness",
    "weekday_weekend_mix",
    "priority_latency_quantiles",
    "nation_ship_latency",
    "brand_price_spread",
    "mktsegment_revenue_share",
    "paragraph_dedup_savings",
    "paragraph_position_bias",
    "knn_label_consistency",
    "order_fanout_histogram",
    "value_pareto_by_type",
    # (e) best-effort tail: the remaining r7 vintage, oldest rows
    # first, so leftover slots refresh the next-stalest keys
    "dup_ngram_coverage",
    "tfidf_keywords",
    "quality_gopher",
    "multimodal_decode_ppm",
    "multimodal_decode_wav",
    "multimodal_frame_sample",
    "event_rollup",
    "event_interarrival",
    "value_quantiles",
    "purchase_click_attribution",
    "dedup_clusters",
    "benchmark_decontaminate",
    "corpus_sample",
    "corpus_shard_pack",
    "dedup_minhash_verified",
    "dedup_simhash_verified",
    "q21_waiting_suppliers",
    "q13_order_count_distribution",
    "q4_order_priority",
    "q12_ship_delay_buckets",
    "q9_profit_by_nation_year",
    "q16_supplier_count_by_part",
    "q11_important_parts",
    "q2_min_cost_supplier",
    "q20_excess_shippers",
    "ngram_jaccard_pairs",
    "embedding_cosine_topk",
    "lang_id",
    "doc_quality_score",
    "token_count",
    "doc_fingerprint",
    "multimodal_decode",
    "text_normalize",
    "pii_scrub",
    "hll_distinct_users",
    "value_histogram_quantiles",
    "ngram_cms_estimate",
    "corpus_quality_pipeline",
    "gopher_repetition",
    "corpus_pack_sequences",
    "ngram_novelty",
    "embedding_hard_negatives",
    "bpe_token_count_batched",
]
# r13 rotation plan: front = any key not certified in r12 (new keys
# that missed the 50-slot cap), then the remaining r7 vintage (the
# 25 keys displaced from slots 26-50 by this round's new keys).



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
