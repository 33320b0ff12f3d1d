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
    # Round 14 rotation (r13 verdict ask #1).  The registry is fully
    # certified (310/310 after r13, zero failures ever), so rotation
    # stays pure vintage refresh plus bounded growth:
    #   slots 1-10  = the 10 remaining r7-vintage keys (pre-verified
    #                 at sf0.1 on the r13 closing tree per the
    #                 handoff);
    #   next slots  = this round's NEW keys, each landed only after
    #                 sf0.001+sf0.01(+sf0.1) oracle verification;
    #   tail        = the 40 oldest r8-vintage keys (also
    #                 pre-verified at sf0.1) fill the remaining
    #                 slots; only the first 50 are recorded.
    # (a) the 10 remaining r7-vintage keys
    "bpe_token_count_batched",
    "corpus_pack_sequences",
    "corpus_quality_pipeline",
    "embedding_hard_negatives",
    "gopher_repetition",
    "hll_distinct_users",
    "ngram_cms_estimate",
    "ngram_novelty",
    "pii_scrub",
    "value_histogram_quantiles",
    # (b) NEW r14 keys (inserted here as they are built + verified)
    "value_weighted_quantiles",
    "nation_supplier_hhi",
    "scd2_intervals",
    "incremental_agg_maintenance",
    "watermark_drop_sweep",
    "truncation_loss_sweep",
    "paragraph_strip_list",
    "kmv_source_overlap",
    "bm25_topk",
    "image_phash_dedup",
    "event_transition_entropy",
    "minhash_perm_sweep",
    "pq_distortion_report",
    # (c) best-effort tail: the 40 oldest r8-vintage keys — whatever
    # the new-key block doesn't displace refreshes the next-stalest
    # rows; leftovers head the r15 rotation
    "ann_nprobe_sweep",
    "ann_recall_eval",
    "as_of_join",
    "bigram_pmi_topk",
    "codec_roundtrip",
    "contrastive_pairs",
    "corpus_temperature_mix",
    "dataset_card",
    "dedup_exact",
    "dedup_minhash_keep",
    "distinct_users_per_type",
    "doc_length_quantiles",
    "embedding_lsh_ann",
    "embedding_outliers",
    "embedding_quantize_int8",
    "embedding_split_audit",
    "event_sessionize",
    "event_transitions",
    "event_type_pivot",
    "event_volume_anomalies",
    "heaps_fit",
    "hopping_window_agg",
    "ivf_balance_report",
    "key_skew_report",
    "length_bucket_batches",
    "line_dedup",
    "loopback_rekey",
    "minhash_band_sweep",
    "minhash_est_error",
    "release_manifest",
    "running_total_per_user",
    "session_window_agg",
    "simhash_hamming_histogram",
    "source_quality_matrix",
    "span_corruption_masks",
    "split_contamination_audit",
    "split_leakage_safe",
    "token_budget_plan",
    "tokenizer_fertility",
    "top_k_per_group",
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
