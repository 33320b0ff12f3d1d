"""Benchmark headline queries; prints ONE JSON line for the driver.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS  (default 32).
Each query is forced end-to-end with a noop sink (full computation,
no driver collect cost)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    # goka-core processor pipeline
    "proc_agg_state",
    "stream_lookup_join",
    "loopback_rekey",
    # windowed / analytical
    "tumbling_window_agg",
    "session_window_agg",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "as_of_join",
    # LLM-data
    "dedup_exact",
    "dedup_minhash_lsh",
    "ngram_jaccard_pairs",
    "embedding_cosine_topk",
    "token_count",
    # round 2 additions
    "q13_order_count_distribution",
    "q9_profit_by_nation_year",
    "dedup_embedding_cosine",
    "embedding_ivf_ann",
    "embedding_pq_ann",
    "dup_ngram_coverage",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from goka_spark.queries import all_queries
    from goka_spark.session import get_session

    spark = get_session("goka_spark_bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()

    # JIT/session warmup (not counted)
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    times: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.time()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        times[name] = round(time.time() - t0, 3)

    sf = sf_dir.rstrip("/").split("sf")[-1]
    print(json.dumps({
        "metric": "headline_queries_total_runtime",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "sf": float(sf),
    }))


if __name__ == "__main__":
    main()
