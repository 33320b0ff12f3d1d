"""Registry of all implemented queries + DuckDB oracles.

``__spark_entry__.py`` re-exports these; every SURVEY.md §2 row with a
query key lives here.  Convention: group keys are the string column
``key``; every computed column is aliased identically in the Spark
plan and the oracle SQL (driver hash-compares by column name).
"""

from goka_spark.queries import analytics, core, llmdata

# The driver's correctness run records exactly the first 50 registry
# entries and stops.  Rotate per round so no key's driver row goes
# >2 rounds stale.  Round 7 (per the r6 verdict's #1 ask): (a) the
# four keys NEW this round (pack_sequences, ngram_novelty,
# hard_negatives, bpe batched) plus the three whose implementation
# or oracle changed (single-scan CMS, integer-exact HLL, pipeline
# oracle line-CTEs) — r06 rows no longer certify those; (b) ALL 41
# keys whose latest driver row is r03 (highest-churn first per the
# verdict); (c) two r04 keys to fill the 50 — with r06∪r07 this
# leaves no key's certification older than r04.  Trailing entries
# past slot 50 are best-effort (the remaining r04 block, queued for
# r8).
_FRONT = [
    # (a) new in r7 / impl-or-oracle changed in r7 — certify first
    "corpus_pack_sequences",
    "ngram_novelty",
    "embedding_hard_negatives",
    "bpe_token_count_batched",
    "ngram_cms_estimate",
    "hll_distinct_users",
    "corpus_quality_pipeline",
    "gopher_repetition",  # r7 refactor: no postings-sized join sides
    "value_histogram_quantiles",  # r7 refactor: shared sketch kernel
    # (b) the r03-stale block (latest driver row three rounds old)
    "ngram_jaccard_pairs",
    "ngram_jaccard_prefix",
    "dedup_clusters",
    "benchmark_decontaminate",
    "proc_latest_n",
    "proc_fold_generic",
    "stream_table_join",
    "stream_lookup_join",
    "output_stream",
    "proc_headers_native",
    "embedding_cosine_topk",
    "lang_id",
    "doc_quality_score",
    "token_count",
    "text_normalize",
    "pii_scrub",
    "doc_fingerprint",
    "dup_ngram_coverage",
    "tfidf_keywords",
    "quality_gopher",
    "corpus_sample",
    "corpus_shard_pack",
    "dedup_minhash_verified",
    "dedup_simhash_verified",
    "multimodal_decode",
    "multimodal_decode_ppm",
    "multimodal_decode_wav",
    "multimodal_frame_sample",
    "q2_min_cost_supplier",
    "q4_order_priority",
    "q9_profit_by_nation_year",
    "q11_important_parts",
    "q12_ship_delay_buckets",
    "q13_order_count_distribution",
    "q16_supplier_count_by_part",
    "q20_excess_shippers",
    "q21_waiting_suppliers",
    "event_rollup",
    "event_interarrival",
    "value_quantiles",
    "purchase_click_attribution",
    # (c) r04 keys filling out the 50
    "q1_pricing_summary",
    "q3_shipping_priority",
    # ---- best-effort tail past the ~50 cap (r8 front: rest of r04)
    "q5_local_supplier",
    "dedup_exact",
    "as_of_join",
    "top_k_per_group",
    "tumbling_window_agg",
    "hopping_window_agg",
    "session_window_agg",
    "running_total_per_user",
    "event_sessionize",
    "distinct_users_per_type",
    "event_type_pivot",
    "q6_forecast_revenue",
    "q10_returned_items",
    "q7_volume_shipping",
    "q14_promo_revenue",
    "q18_large_orders",
    "q19_discounted_brand",
    "funnel_conversion",
    "user_retention_cohort",
    "event_dedup_window",
    "q22_no_order_customers",
    "above_avg_balance",
    "semi_join_active_parts",
    "q8_market_share",
    "q15_top_supplier",
    "q17_small_quantity",
    "loopback_rekey",
    "view_point_get",
    "view_range_scan",
    "view_iterate_all",
    "visitor_apply",
    "proc_delete_key",
    "multi_input_merge",
    "proc_headers",
    "codec_roundtrip",
    "proc_last_state",
    "line_dedup",
    "embedding_lsh_ann",
    # new mid-r7 (C82-C85) — past the cap on purpose: the r7 front is
    # reserved for the verdict's r03-stale block; these certify in r8
    "dedup_minhash_keep",
    "split_leakage_safe",
    "corpus_temperature_mix",
    "length_bucket_batches",
    "embedding_outliers",
    "release_manifest",
    "split_contamination_audit",
    "vocab_growth",
    "embedding_quantize_int8",
    "unigram_token_count",
    "unigram_encode_docs",
    "tokenizer_fertility",
    "ann_recall_eval",
    "event_transitions",
    "minhash_est_error",
    "ann_nprobe_sweep",
    "bigram_pmi_topk",
    "span_corruption_masks",
    "contrastive_pairs",
    "minhash_band_sweep",
    "zipf_fit",
    "ivf_balance_report",
    "key_skew_report",
    "heaps_fit",
    "token_budget_plan",
    "dataset_card",
    "simhash_hamming_histogram",
    "embedding_split_audit",
    "winnow_fingerprints",
    "winnow_overlap_pairs",
    "event_volume_anomalies",
    "doc_length_quantiles",
    "source_quality_matrix",
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
