"""Registry of all implemented queries + DuckDB oracles.

``__spark_entry__.py`` re-exports these; every SURVEY.md §2 row with a
query key lives here.  Convention: group keys are the string column
``key``; every computed column is aliased identically in the Spark
plan and the oracle SQL (driver hash-compares by column name).
"""

from goka_spark.queries import analytics, core, llmdata

# The driver's correctness run records roughly the first 50 registry
# entries and stops (cap or time budget — round 1 recorded exactly
# 50 of 61).  Register queries that have NEVER had a driver row
# FIRST — round-2 additions, then the 11 keys the round-1 run missed
# (VERDICT.md r1 item 1) — so a capped run verifies them before
# re-proving queries already green in CORRECTNESS_r01.json.
_FRONT = [
    "ngram_jaccard_prefix",
    "dup_ngram_coverage",
    "tfidf_keywords",
    "quality_gopher",
    "embedding_pq_ann",
    "embedding_ivf_pq_ann",
    "multimodal_decode_ppm",
    "multimodal_decode_wav",
    "multimodal_frame_sample",
    "event_rollup",
    "event_interarrival",
    "value_quantiles",
    "purchase_click_attribution",
    "doc_repetition",
    "dedup_clusters",
    "corpus_filter_pipeline",
    "benchmark_decontaminate",
    "corpus_sample",
    "corpus_shard_pack",
    "dedup_minhash_verified",
    "dedup_simhash_verified",
    "q21_waiting_suppliers",
    "proc_headers_native",
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
    "embedding_lsh_ann",
    "embedding_ivf_ann",
    "dedup_embedding_cosine",
    "lang_id",
    "doc_quality_score",
    "token_count",
    "doc_fingerprint",
    "multimodal_decode",
    "text_normalize",
    "pii_scrub",
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
    return _ordered(o)
