"""Registry of all implemented queries + DuckDB oracles.

``__spark_entry__.py`` re-exports these; every SURVEY.md §2 row with a
query key lives here.  Convention: group keys are the string column
``key``; every computed column is aliased identically in the Spark
plan and the oracle SQL (driver hash-compares by column name).
"""

from goka_spark.queries import analytics, core, llmdata

# The driver's correctness run records exactly the first 50 registry
# entries and stops (CORRECTNESS_r04 has 50 rows).  Rotate per round so
# no key's driver row goes >2 rounds stale.  Round 6: NO r05 driver
# correctness file was ever recorded, so the r5 rotation was never
# consumed — every key ordered for r5 is still uncertified.  Order:
# (a) the round-6 operators (newest code first); (b) every round-5
# operator (none has a driver row); (c) keys whose implementation or
# oracle changed after their last driver row (ANN index o1-rewire +
# XXH64 oracle flips + unpersist/empty-doc-guard touched paths);
# (d) the r03-stale block, highest-churn first.  Trailing entries past
# slot 50 are best-effort.
_FRONT = [
    # (a) round-6 new — never certified
    "bpe_encode_docs",
    "hll_distinct_users",
    "value_histogram_quantiles",
    "ngram_cms_estimate",
    "corpus_quality_pipeline",
    "image_dhash_dedup",
    "lang_audit",
    "dedup_exact_prioritized",
    "bpe_token_count",
    "perplexity_buckets",
    "line_quality_filter",
    "embedding_knn_graph",
    "gopher_repetition",
    "nb_quality_classify",
    "corpus_shuffle",
    "vocab_coverage",
    # (b) round-5 new — never certified (no r05 run was recorded)
    "dedup_semantic",
    "corpus_split",
    "corpus_domain_mix",
    "dedup_incremental",
    "bloom_decontaminate",
    "doc_entropy",
    "blocklist_filter",
    "common_ngrams",
    "cluster_balanced_sample",
    "near_decontaminate",
    "ngram_containment_pairs",
    "embedding_cluster_assign",
    "decontaminate_spans",
    "corpus_weighted_sample",
    "corpus_stats",
    "minhash_containment_est",
    "source_overlap_matrix",
    "dup_span_remove",
    "embedding_pca_project",
    "decontaminate_span_remove",
    # (c) impl/oracle changed after their last driver row
    "embedding_ivf_ann",
    "embedding_pq_ann",
    "embedding_ivf_pq_ann",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "doc_repetition",
    "corpus_filter_pipeline",
    "dedup_embedding_cosine",
    "ngram_jaccard_auto",
    "dup_span_extract",
    "corpus_importance_weights",
    "doc_lm_score",
    # (d) r03-stale — last driver row three rounds old
    "proc_count_per_key",
    "proc_agg_state",
    "proc_latest_n",
    "proc_fold_generic",
    "stream_table_join",
    "stream_lookup_join",
    "output_stream",
    "proc_headers_native",
    "ngram_jaccard_pairs",
    "embedding_cosine_topk",
    "lang_id",
    "dedup_clusters",
    "benchmark_decontaminate",
    # ---- best-effort tail past the ~50 cap (r07 front candidates)
    "corpus_sample",
    "corpus_shard_pack",
    "dedup_minhash_verified",
    "dedup_simhash_verified",
    "multimodal_decode",
    "multimodal_decode_ppm",
    "multimodal_decode_wav",
    "multimodal_frame_sample",
    "text_normalize",
    "pii_scrub",
    "dup_ngram_coverage",
    "tfidf_keywords",
    "quality_gopher",
    "purchase_click_attribution",
    "q13_order_count_distribution",
    "q4_order_priority",
    "q12_ship_delay_buckets",
    "q9_profit_by_nation_year",
    "q16_supplier_count_by_part",
    "q11_important_parts",
    "q2_min_cost_supplier",
    "q20_excess_shippers",
    "q21_waiting_suppliers",
    "event_rollup",
    "event_interarrival",
    "value_quantiles",
    "ngram_jaccard_prefix",
    "token_count",
    "doc_fingerprint",
]



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
