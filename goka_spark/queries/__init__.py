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
    # Round 13 rotation (r12 verdict ask #4).  The registry is fully
    # certified (293/293 after r12, zero failures ever), so rotation
    # stays pure vintage refresh plus bounded growth:
    #   slots 1-25  = the 25 next-oldest r7-vintage keys (the r12
    #                 section-(e) head, pre-verified 25/25 at sf0.1
    #                 on the r12 closing tree per the handoff);
    #   slots 26-50 = this round's NEW keys, each landed only after
    #                 sf0.001+sf0.01 oracle verification; tail keys
    #                 fill any slot a new key hasn't taken yet.
    # (a) the 25 next-oldest r7-vintage keys
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
    # (b) NEW r13 keys (inserted here as they are built + verified)
    "source_paragraph_savings",
    "paragraph_template_detect",
    "doc_prefix_dup_partners",
    "longest_shared_run_pairs",
    "paragraph_minhash_pairs",
    "wav_spectral_tilt",
    "image_entropy_gate",
    "video_motion_profile",
    "hll_merge_sources",
    "paragraph_minhash_keep",
    "hll_register_sweep",
    "cms_width_sweep",
    "customer_reorder_latency",
    "session_gap_sweep",
    "referential_integrity_audit",
    "stream_disorder_audit",
    "pq_code_utilization",
    # (c) best-effort tail: the 18 remaining r7-vintage keys — oldest
    # rows first, so leftover slots refresh the next-stalest keys;
    # whatever the r13 front doesn't cover heads the r14 rotation
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
