"""Round-9 focused probe: the incremental-dedup family at 256x
(r8 verdict ask #6 — adjudicate the ad-hoc path's 64x spill signal
and verify the persisted SignatureStore path stays linear four
doublings past it).

Materializes sdocs_x256 as 4 second-level-salted copies of the
already-materialized sdocs_x64 (word suffix `_j`, doc_id shift 1e9 per
copy) so near-dup pairs stay within-copy, then times:
- dedup_incremental (ad-hoc: corpus signatures rebuilt per batch)
- SignatureStore.build (one-time, amortized across batches)
- SignatureStore.dedup_batch on a FIXED 500-doc batch (the production
  per-ingest cost)
- ad-hoc incremental_dedup on the same fixed batch (the comparison)

Usage: python tools/scale_probe_r9.py [factors...]   (default: 256)
Results deep-merge into tools/scale_results.json like the other
probes.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from scale_probe import WORK, timed  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402

from goka_spark.session import get_session  # noqa: E402


def salted_docs_256(spark, factor: int):
    """factor must be 64 * k: builds sdocs_x{factor} from sdocs_x64
    with a second word-salt level (suffix _j) so copies stay
    pair-disjoint, mirroring scale_probe.py's first-level salting."""
    path = f"{WORK}/sdocs_x{factor}"
    if os.path.exists(path):
        return spark.read.parquet(path)
    k = factor // 64
    base = spark.read.parquet(f"{WORK}/sdocs_x64")
    parts = []
    for j in range(k):
        parts.append(
            base
            .withColumn("doc_id", F.col("doc_id") + j * 1_000_000_000)
            .withColumn("text", F.array_join(
                F.transform(F.split("text", " "),
                            lambda w: F.concat(w, F.lit(f"_{j}"))),
                " ")))
    sd = parts[0]
    for p in parts[1:]:
        sd = sd.unionByName(p)
    sd.repartition(max(factor // 2, 32)).write.mode("overwrite") \
        .parquet(path)
    return spark.read.parquet(path)


def main():
    factors = [int(x) for x in sys.argv[1:]] or [256]
    spark = get_session("scale_probe_r9")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    from goka_spark.functions import dedup as D
    from goka_spark.functions.sig_store import SignatureStore

    results = {}
    for f in factors:
        sdocs = salted_docs_256(spark, f) if f >= 64 else \
            spark.read.parquet(f"{WORK}/sdocs_x{f}")
        r = {"docs_rows": sdocs.count()}

        inc_batch = sdocs.filter(F.col("doc_id") % 10 == 0)
        inc_corpus = sdocs.filter(F.col("doc_id") % 10 != 0)
        r["dedup_incremental"] = timed("inc", D.incremental_dedup(
            inc_batch, inc_corpus, "doc_id", "text"))

        store = SignatureStore(spark, f"scaleprobe_sig_x{f}")
        t0 = time.time()
        store.build(inc_corpus, "doc_id", "text")
        r["sig_store_build"] = round(time.time() - t0, 2)
        fixed_batch = sdocs.filter(F.col("doc_id") < 500)
        r["sig_store_probe"] = timed("probe", store.dedup_batch(
            fixed_batch, "doc_id", "text"))
        r["sig_store_adhoc"] = timed("adhoc", D.incremental_dedup(
            fixed_batch, inc_corpus, "doc_id", "text"))
        store.drop()

        results[f] = r
        print(f, json.dumps(r))
        spark.catalog.clearCache()

    out_path = "/root/repo/tools/scale_results.json"
    if os.path.exists(out_path):
        with open(out_path) as fh:
            prev = json.load(fh)
        for kk, v in results.items():
            prev.setdefault(str(kk), {}).update(v)
        results = prev
    with open(out_path, "w") as fh:
        json.dump(results, fh, indent=1)


if __name__ == "__main__":
    main()
