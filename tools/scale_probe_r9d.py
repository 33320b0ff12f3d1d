"""Focused scale runner for the final round-9 operator family
(C158-C163 text/curation ops, B72-B74 behavioral analytics).

Reuses the replicated parquet under /tmp and deep-merges per-op rows
into scale_results.json (scale_probe_r8.py discipline: per-op ratios
only, never cross-op totals).

edit_distance_pairs is probed only to 4x ON PURPOSE: replication
multiplies exact-duplicate families, so the TRUE candidate-pair count
grows ~quadratically (8k -> ~130k pairs) — the op is linear in pairs,
not in docs, and the row to watch is the per-pair verify cost.

Usage: python tools/scale_probe_r9d.py [factors...]  (default: 1 4 16 64)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from scale_probe import WORK, replicate, timed  # noqa: E402

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from goka_spark.functions import dedup as D  # noqa: E402
from goka_spark.functions import text as T  # noqa: E402
from goka_spark.session import get_session  # noqa: E402


def main():
    factors = [int(x) for x in sys.argv[1:]] or [1, 4, 16, 64]
    spark = get_session("scale_probe_r9d")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    results = {}
    for f in factors:
        docs_path = f"{WORK}/documents_x{f}"
        if not os.path.exists(docs_path):
            docs_path = replicate(spark, "documents", f, ["doc_id"])
        ev_path = replicate(spark, "events", f, ["event_id", "user_id"])
        docs = spark.read.parquet(docs_path)
        ev = spark.read.parquet(ev_path)
        r = {}

        # three scalar regexp counts per row — scan-stage, linear
        r["readability"] = timed("rd", T.readability_fre(
            docs, "doc_id", "text"))

        # scan-stage zip_with pair gen (L*w rows/doc) + hash-aggs
        r["skipgram_pmi"] = timed("sg", T.skipgram_pmi_topk(
            docs, "doc_id", "text"))

        # (source, word) postings + two hash-aggs — linear
        w = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
        wc = (docs.select("source", F.explode(w).alias("w"))
              .groupBy("source", "w").agg(F.count("*").alias("c")))
        r["hapax"] = timed("hx", wc.groupBy("source").agg(
            F.count("*").alias("t"),
            F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).alias("h")))

        # prefix slice + hash-agg — linear
        pref = F.array_join(F.slice(w, 1, 3), " ")
        r["template_prefix"] = timed("tp", docs
                                     .select(pref.alias("p"), "doc_id")
                                     .groupBy("p")
                                     .agg(F.count("*").alias("n"),
                                          F.min("doc_id").alias("rep"))
                                     .filter(F.col("n") >= 2))

        # winnow candidates + capped Levenshtein verify — linear in
        # TRUE pairs (replication inflates pairs ~f²; only probe to
        # 4x, and judge the per-pair cost, not the wall ratio)
        if f <= 4:
            pairs = D.edit_distance_pairs(docs, "doc_id", "text")
            t = timed("ed", pairs)
            n_pairs = pairs.count()
            r["edit_verify"] = t
            r["edit_pairs"] = n_pairs
            r["edit_us_per_pair"] = round(t * 1e6 / max(n_pairs, 1), 1)

        # distinct (user,type) + user-keyed self-join + tiny marginals
        ut = ev.select("user_id", "event_type").distinct()
        a, b = ut.alias("a"), ut.alias("b")
        r["cooccur_lift"] = timed("cl", a.join(b, "user_id")
                                  .filter(F.col("a.event_type")
                                          < F.col("b.event_type"))
                                  .groupBy("a.event_type",
                                           "b.event_type")
                                  .agg(F.count("*").alias("n")))

        # distinct (user,week) + ONE lag/lead window + week aggs
        uw = (ev.select("user_id",
                        F.expr("datediff(to_date(ts), DATE "
                               "'1970-01-01') div 7").alias("wk"))
              .distinct())
        wdw = Window.partitionBy("user_id").orderBy("wk")
        seq = (uw.withColumn("_p", F.lag("wk").over(wdw))
               .withColumn("_n", F.lead("wk").over(wdw)))
        r["growth_acct"] = timed("ga", seq.groupBy("wk").agg(
            F.sum(F.when(F.col("_p").isNull(), 1).otherwise(0))
            .alias("nw"),
            F.count("*").alias("na")))

        # hour-cell hash-agg + two bucket-keyed windows on the small
        # cell table — events scanned once
        cell = (ev.groupBy("event_type", F.to_date("ts").alias("_d"),
                           F.hour("ts").alias("hod"))
                .agg(F.count("*").alias("cnt"))
                .withColumn("dow", F.expr(
                    "(datediff(_d, DATE '1970-01-01') + 3) % 7")))
        key = ["event_type", "dow", "hod"]
        wk2 = Window.partitionBy(*key).orderBy("cnt", "_d")
        med = (cell.withColumn("_rn", F.row_number().over(wk2))
               .withColumn("_c", F.count("*").over(
                   Window.partitionBy(*key)))
               .filter(F.col("_rn") == F.expr("(_c + 1) DIV 2"))
               .select(*key, F.col("cnt").alias("med")))
        r["seasonal_cells"] = timed("sa", cell.join(
            F.broadcast(med), key))

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
