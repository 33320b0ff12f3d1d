"""Focused scale runner for round 13: the 13 r12 keys the r12 probe
did not cover (VERDICT r12 ask #5 — the B-side analytics keys, the
label-QA pair, the remaining paragraph rows, and the RE-PLANNED
value_pareto_by_type) plus the 7 new r13 keys (C197-C203).

Unlike scale_probe_r12.py (which re-expressed each op inline), this
runner materializes a replicated SF DIRECTORY per factor and times
the REAL registry functions against it — the probe measures the
exact shipped plan, so probe and query can never drift apart.

Replication caveats (same accounting as SCALE.md r9/r12):
- longest_shared_run_pairs is capped at 4x: replication multiplies
  exact-duplicate families, so the winnow CANDIDATE PAIR count grows
  ~quadratically in the factor while the op is linear in pairs (the
  winnow_split_contamination / edit_distance_pairs precedent).
- paragraph_minhash_pairs / paragraph_template_detect /
  doc_prefix_dup_partners: replication repeats the same TEXT, so the
  distinct-unit side (distinct paragraphs / prefix-hash vocabulary)
  is CONSTANT while the instance-side scan grows — the measured
  growth is the scan+agg cost, which is the real 100 TB cost.
- knn_label_consistency builds its persisted ANN index per factor
  (a build artifact, FAISS discipline); the timed row includes the
  probe-scale build once per factor — noted, not subtracted.

Usage: python tools/scale_probe_r13.py [factors...] (default 1 4 16)
"""

from __future__ import annotations

import json
import os
import shutil
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from scale_probe import BASE, WORK, replicate, timed  # noqa: E402

from goka_spark.session import get_session  # noqa: E402

#: replicated big tables and the id columns shifted per copy
_BIG = {
    "documents": ["doc_id"],
    "events": ["event_id", "user_id"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey"],
    "embeddings": ["vec_id"],
}
#: bounded dims copied once (their size does NOT scale with the
#: corpus factor here — nation/region are truly bounded; customer/
#: supplier/part replication is not what these 20 keys exercise)
_DIMS = ["region", "nation", "customer", "supplier", "part"]

KEYS_16 = [
    # r12 leftovers
    "paragraph_dedup_savings",
    "paragraph_position_bias",
    "domain_quality_drift",
    "doc_lang_mix",
    "numeric_token_profile",
    "embedding_centroid_shift",
    "knn_label_consistency",
    "quality_gate_venn",
    "weekday_weekend_mix",
    "nation_ship_latency",
    "brand_price_spread",
    "mktsegment_revenue_share",
    "value_pareto_by_type",     # the r13 re-planned two-pass rank
    # r13 additions
    "source_paragraph_savings",
    "paragraph_template_detect",
    "doc_prefix_dup_partners",
    "paragraph_minhash_pairs",
    "wav_spectral_tilt",
    "image_entropy_gate",
]
KEYS_4 = [
    "longest_shared_run_pairs",   # pair-quadratic under replication
]


def build_sfdir(spark, factor: int) -> str:
    """A /tmp directory shaped like an sf dir: replicated big tables
    + one copy of the bounded dims, so registry functions run on it
    unmodified."""
    d = f"{WORK}/sfdir_x{factor}"
    done = f"{d}/.complete"
    if os.path.exists(done):
        return d
    os.makedirs(d, exist_ok=True)
    for t, ids in _BIG.items():
        src = replicate(spark, t, factor, ids)
        dst = f"{d}/{t}.parquet"
        if not os.path.exists(dst):
            shutil.copytree(src, dst)
    for t in _DIMS:
        dst = f"{d}/{t}.parquet"
        if not os.path.exists(dst):
            # single-file source parquet → copy as-is
            src = f"{BASE}/{t}.parquet"
            if os.path.isdir(src):
                shutil.copytree(src, dst)
            else:
                shutil.copyfile(src, dst)
    open(done, "w").write("ok")
    return d


def main():
    factors = [int(x) for x in sys.argv[1:]] or [1, 4, 16]
    spark = get_session("scale_probe_r13")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    from goka_spark.queries import all_queries
    qs = all_queries()

    results = {}
    for f in factors:
        d = build_sfdir(spark, f)
        r = {}
        for key in KEYS_16 + (KEYS_4 if f <= 4 else []):
            r[key] = timed(key, qs[key](spark, d))
            print(f"  x{f} {key}: {r[key]}s", flush=True)
        results[f"x{f}"] = r
        print(f"x{f}: {json.dumps(r)}", flush=True)

    out = "tools/scale_results.json"
    merged = {}
    if os.path.exists(out):
        merged = json.load(open(out))
    for k, v in results.items():
        merged.setdefault(k, {}).update(v)
    json.dump(merged, open(out, "w"), indent=1, sort_keys=True)
    print("merged into", out)


if __name__ == "__main__":
    main()
