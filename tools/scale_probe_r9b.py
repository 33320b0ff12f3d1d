"""Focused scale runner for the round-9 operator family.

Reuses the salted-docs / events parquet the full sweep materialized
under /tmp and times ONLY the r9 family at each factor, deep-merging
rows into scale_results.json (same discipline as scale_probe_r8.py:
per-op ratios only, never cross-op totals).

Usage: python tools/scale_probe_r9b.py [factors...]  (default: 1 4 16 64)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from scale_probe import WORK, replicate, timed  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402

from goka_spark.session import get_session  # noqa: E402


def main():
    factors = [int(x) for x in sys.argv[1:]] or [1, 4, 16, 64]
    spark = get_session("scale_probe_r9b")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    from goka_spark.functions import dedup as D
    from goka_spark.functions import multimodal as M
    from goka_spark.functions import text as T

    results = {}
    for f in factors:
        sd_path = f"{WORK}/sdocs_x{f}"
        if not os.path.exists(sd_path):
            raise SystemExit(f"missing {sd_path}: run scale_probe.py {f}")
        ev_path = replicate(spark, "events", f, ["event_id", "user_id"])
        sdocs = spark.read.parquet(sd_path)
        ev = spark.read.parquet(ev_path)
        r = {"docs_rows": sdocs.count()}

        # lines are scan-stage; per-(source, line) hash-agg — ~linear
        w = F.split(F.trim(F.col("text")), r"\s+")
        n_lines = F.greatest(F.ceil(F.size(w) / 10.0).cast("int"), F.lit(1))
        reshaped = sdocs.select(
            "doc_id", "source",
            F.array_join(F.transform(
                F.sequence(F.lit(0), n_lines - 1),
                lambda i: F.array_join(F.slice(w, i * 10 + 1, 10), " ")),
                "\n").alias("text"))
        r["boilerplate"] = timed("bp", T.boilerplate_by_source(
            reshaped, "doc_id", "text", "source",
            ratio_e6=40_000, min_df=2))

        # 8 one-agg GD rounds; model state 4 doubles — expect ~linear
        t0 = time.time()
        T.logreg_train(sdocs, "doc_id", "text", F.col("lang") == "en")
        r["logreg_train"] = round(time.time() - t0, 2)

        # trigram profile agg + broadcast votes — ~linear in chars
        from pyspark.sql import Window
        tri = (sdocs.select(
            "doc_id", "lang",
            F.explode(F.transform(
                F.sequence(F.lit(1),
                           F.greatest(F.length("text") - 2, F.lit(1))),
                lambda i: F.substring(F.col("text"), i, 3))).alias("g"))
            .filter(F.length("g") == 3))
        prof = (tri.groupBy("lang", "g").agg(F.count("*").alias("c"))
                .withColumn("rn", F.row_number().over(
                    Window.partitionBy("lang")
                    .orderBy(F.col("c").desc(), F.col("g"))))
                .filter(F.col("rn") <= 20)
                .select(F.col("lang").alias("plang"), "g"))
        votes = (tri.select("doc_id", "g").distinct()
                 .join(F.broadcast(prof), "g")
                 .groupBy("doc_id", "plang").agg(F.count("*").alias("v")))
        r["char_trigram_langid"] = timed("tri", votes)

        # weighted jaccard rides the C4 candidate list — expect the
        # ngram_jaccard law (budget-bounded postings join)
        r["weighted_jaccard"] = timed("wj", D.weighted_jaccard_pairs(
            sdocs, "doc_id", "text", n=3, threshold=0.05, max_df=50))

        # held-out LM: two postings passes + count hash-aggs — ~linear
        train = sdocs.filter(F.col("doc_id") % 7 != 0)
        test = sdocs.filter(F.col("doc_id") % 7 == 0)
        r["lm_heldout"] = timed("lm", T.lm_heldout_logprob(
            train, test, "doc_id", "text"))
        r["lm_backoff"] = timed("sb", T.lm_stupid_backoff(
            train, test, "doc_id", "text"))

        # WHT hashes: one Arrow pass, 64x64 int matmul per image
        spec = sdocs.select(
            "doc_id", F.lit(8).alias("w8"), F.lit(8).alias("h8"),
            (F.col("doc_id") % 57).cast("int").alias("seed"))
        hashed = M.image_wht_hash(
            M.encode_ppm_quad(spec, "doc_id", "w8", "h8", "seed"))
        r["wht_hash"] = timed("wht", hashed)

        # events-side: one windowed agg / one per-user window
        ohlc = (ev.groupBy(F.window("ts", "1 hour").alias("_w"),
                           "event_type")
                .agg(F.max(F.round(F.col("value") * 100).cast("long"))
                     .alias("h"), F.count("*").alias("n")))
        r["ohlc"] = timed("ohlc", ohlc)
        wdw = Window.partitionBy("user_id").orderBy("ts", "event_id")
        twa = (ev.select("user_id", "ts", "event_id",
                         F.round(F.col("value") * 100).cast("long")
                         .alias("v"))
               .withColumn("_nxt", F.lead(F.unix_micros("ts")).over(wdw))
               .groupBy("user_id")
               .agg(F.sum(F.col("v")
                          * (F.col("_nxt") - F.unix_micros("ts")))
                    .alias("num")))
        r["twa"] = timed("twa", twa)

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
