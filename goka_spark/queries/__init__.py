"""Registry of all implemented queries + DuckDB oracles.

``__spark_entry__.py`` re-exports these; every SURVEY.md §2 row with a
query key lives here.  Convention: group keys are the string column
``key``; every computed column is aliased identically in the Spark
plan and the oracle SQL (driver hash-compares by column name).
"""

from goka_spark.queries import analytics, core, llmdata

# The driver's correctness run records exactly the first 50 registry
# entries and stops (CORRECTNESS_r04 has 50 rows).  Rotate per round so
# no key's driver row goes >2 rounds stale.  Round 5: the 49 keys with
# NO r04 row, ordered (a) dedup_semantic — the one key never certified
# by any driver run; (b) embedding_pq_ann / embedding_ivf_pq_ann —
# rewired onto the persisted ANN index AFTER their last (r03) rows;
# (c) keys whose implementation changed in r4/r5 without re-signing
# (doc_repetition shingle-postings rewrite, corpus_filter_pipeline
# persist, dedup_embedding_cosine consumer); (d) the r03-only block.
# r04 ∪ r05 then covers all 99 keys.  Trailing extras past slot 49 are
# best-effort (r4 keys whose ORACLE text gains the empty-doc guard).
_FRONT = [
    # (a) never certified — the nine NEW round-5 operators first
    # (certifying new code beats re-signing unchanged r03-green keys;
    # the 10 keys this pushes past slot 50 — dedup_simhash_verified,
    # multimodal_decode(+ppm/wav/frame), text_normalize, pii_scrub,
    # dup_ngram_coverage, tfidf_keywords, quality_gopher — are
    # r03-certified and UNCHANGED, and rotate to the front in r06),
    # then the one key no driver run has ever signed
    "corpus_split",
    "corpus_domain_mix",
    "dedup_incremental",
    "bloom_decontaminate",
    "doc_entropy",
    "blocklist_filter",
    "common_ngrams",
    "cluster_balanced_sample",
    "near_decontaminate",
    "dedup_semantic",
    # (b) index-rewire post-dates the r03 rows
    "embedding_pq_ann",
    "embedding_ivf_pq_ann",
    # (c) behavior-changed since last row — including the two
    # late-r5 oracle flips (XXH64-in-SQL): their r04 rows were
    # rows-only, the r05 rows hash-verify the production paths
    "dedup_minhash_lsh",
    "dedup_simhash",
    "doc_repetition",
    "corpus_filter_pipeline",
    "dedup_embedding_cosine",
    # (d) r03-only block — re-sign before the rows go 2 rounds stale
    "proc_count_per_key",
    "proc_agg_state",
    "proc_latest_n",
    "proc_fold_generic",
    "stream_table_join",
    "stream_lookup_join",
    "output_stream",
    "proc_headers_native",
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
    "ngram_jaccard_pairs",
    "ngram_jaccard_prefix",
    "embedding_cosine_topk",
    "lang_id",
    "doc_quality_score",
    "token_count",
    "doc_fingerprint",
    "dedup_clusters",
    "benchmark_decontaminate",
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
    # best-effort tail (oracle-text change this round; r06 candidates)
    "dup_span_extract",
    "corpus_importance_weights",
    "doc_lm_score",
    "ngram_containment_pairs",  # NEW late-r5; r06 front candidate
    "embedding_cluster_assign",  # NEW late-r5; r06 front candidate
    "decontaminate_spans",       # NEW late-r5; r06 front candidate
    "corpus_weighted_sample",    # NEW late-r5; r06 front candidate
    "corpus_stats",              # NEW late-r5; r06 front candidate
    "minhash_containment_est",   # NEW late-r5; r06 front candidate
    "source_overlap_matrix",     # NEW late-r5; r06 front candidate
    "dup_span_remove",           # NEW late-r5; r06 front candidate
    "embedding_pca_project",     # NEW late-r5; r06 front candidate
    "decontaminate_span_remove", # NEW late-r5; r06 front candidate
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
