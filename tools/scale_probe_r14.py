"""Focused scale runner for round 14: the 10 new r14 keys (B96-B100,
C210-C214), timed as the REAL registry functions against replicated
SF directories (the r13 convention — probe and shipped plan can
never drift apart).

Replication caveats (same accounting as SCALE.md r9/r12/r13):
- paragraph_strip_list / kmv_source_overlap: replication repeats the
  same TEXT, so the distinct-unit side (duplicated-paragraph
  vocabulary / per-source gram sets and their KMV sketches) is
  CONSTANT while the instance-side scan grows — the measured growth
  is the scan+agg cost, which is the real 100 TB cost.
- watermark_drop_sweep: replication shifts event_id per copy, so the
  arrival stream gets factor× longer with the same disorder pattern
  per copy — prefix-max work is linear in the stream.
- image_phash_dedup: doc_id shifting preserves the %50 texture law;
  per-image DCT work is exactly linear in images.

Usage: python tools/scale_probe_r14.py [factors...] (default 1 4 16)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from scale_probe import timed  # noqa: E402
from scale_probe_r13 import build_sfdir  # noqa: E402

from goka_spark.session import get_session  # noqa: E402

KEYS = [
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
]


def main():
    factors = [int(x) for x in sys.argv[1:]] or [1, 4, 16]
    spark = get_session("scale_probe_r14")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    from goka_spark.queries import all_queries
    qs = all_queries()

    results = {}
    for f in factors:
        d = build_sfdir(spark, f)
        r = {}
        for key in KEYS:
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
