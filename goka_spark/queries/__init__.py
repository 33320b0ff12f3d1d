"""Registry of all implemented queries + DuckDB oracles.

``__spark_entry__.py`` re-exports these; every SURVEY.md §2 row with a
query key lives here.  Convention: group keys are the string column
``key``; every computed column is aliased identically in the Spark
plan and the oracle SQL (driver hash-compares by column name).
"""

from goka_spark.queries import analytics, core, llmdata

# The driver's correctness run records roughly the first 50 registry
# entries and stops (cap or time budget).  Rotate per round: list the
# keys whose latest driver row pre-dates the current code FIRST (round
# 4: the 43 keys last certified in CORRECTNESS_r01, before the
# base.py:load() change — VERDICT.md r3 item 1), then the keys whose
# implementation changes THIS round (ANN artifact caching / physical
# pruning, ngram max_df policy, lsh oracle), so a capped run always
# re-signs everything that moved.
_FRONT = [
    # -- r01-only keys: re-certify under post-base.py load() --
    "loopback_rekey",
    "view_point_get",
    "view_range_scan",
    "view_iterate_all",
    "visitor_apply",
    "emitter_roundtrip",
    "proc_delete_key",
    "multi_input_merge",
    "proc_headers",
    "codec_roundtrip",
    "changelog_compaction",
    "proc_last_state",
    "tumbling_window_agg",
    "hopping_window_agg",
    "session_window_agg",
    "running_total_per_user",
    "event_sessionize",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "q6_forecast_revenue",
    "q10_returned_items",
    "top_k_per_group",
    "distinct_users_per_type",
    "approx_distinct_users",
    "event_type_pivot",
    "as_of_join",
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
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    # -- keys new or changed in round 4 (oracle-backed first; the
    # trailing rows-only ANN keys can fall past the driver cap) --
    "ngram_jaccard_auto",
    "dup_span_extract",
    "corpus_importance_weights",
    "line_dedup",
    "doc_lm_score",
    "embedding_lsh_ann",
    "embedding_ivf_ann",
    "embedding_pq_ann",
    "embedding_ivf_pq_ann",
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
