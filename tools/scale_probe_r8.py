"""Focused scale runner for the round-8 operator family.

Reuses the salted-docs / rotated-embeddings parquet that the full
sweep (scale_probe.py) materialized under /tmp and times ONLY the r8
family at each factor, deep-merging rows into scale_results.json so
late-round additions get their 1x-64x columns without re-timing the
whole board (cross-OP comparisons always cite per-op ratios, never
cross-op totals, so a per-family session is probe-discipline-clean).

Usage: python tools/scale_probe_r8.py [factors...]  (default: 1 4 16 64)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from scale_probe import WORK, r8_family, replicate  # noqa: E402

from goka_spark.session import get_session  # noqa: E402


def main():
    factors = [int(x) for x in sys.argv[1:]] or [1, 4, 16, 64]
    spark = get_session("scale_probe_r8")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    from goka_spark.functions import dedup as D

    results = {}
    for f in factors:
        sd_path = f"{WORK}/sdocs_x{f}"
        emb_path = f"{WORK}/emb_x{f}"
        if not (os.path.exists(sd_path) and os.path.exists(emb_path)):
            raise SystemExit(
                f"missing {sd_path} or {emb_path}: run the full sweep "
                f"(scale_probe.py {f}) first to materialize inputs")
        # keep the events/docs replicas warm too so a later full sweep
        # at this factor reuses them
        replicate(spark, "documents", f, ["doc_id"])
        sdocs = spark.read.parquet(sd_path)
        emb_f = spark.read.parquet(emb_path)

        # the keep-pipeline CC graph the cluster histogram reads —
        # timed in the full sweep (minhash_keep); rebuilt here as
        # input, not as a measurement
        kp_pairs = D.minhash_lsh_pairs(sdocs, "doc_id", "text",
                                       num_perm=32, bands=8)
        kp_cc = D.connected_components(kp_pairs)

        r = {"docs_rows": sdocs.count()}
        t0 = time.time()
        r8_family(r, sdocs, emb_f, kp_cc)
        r["_family_total"] = round(time.time() - t0, 2)
        results[f] = r
        print(f, json.dumps(r))
        spark.catalog.clearCache()
        import gc
        gc.collect()
        spark._jvm.System.gc()

    out_path = "/root/repo/tools/scale_results.json"
    if os.path.exists(out_path):
        with open(out_path) as fh:
            prev = json.load(fh)
        for k, v in results.items():
            prev.setdefault(str(k), {}).update(v)
        results = prev
    with open(out_path, "w") as fh:
        json.dump(results, fh, indent=1)


if __name__ == "__main__":
    main()
