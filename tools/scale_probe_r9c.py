"""Focused scale runner for the late-round-9 operator family
(URL curation C148-C150, user_path_topk B50, max_drawdown B52).

Reuses the replicated parquet under /tmp and deep-merges per-op rows
into scale_results.json (scale_probe_r8.py discipline: per-op ratios
only, never cross-op totals).

Usage: python tools/scale_probe_r9c.py [factors...]  (default: 1 4 16 64)
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

from goka_spark.functions import urls as U  # noqa: E402
from goka_spark.session import get_session  # noqa: E402


def main():
    factors = [int(x) for x in sys.argv[1:]] or [1, 4, 16, 64]
    spark = get_session("scale_probe_r9c")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    results = {}
    for f in factors:
        docs_path = f"{WORK}/documents_x{f}"
        if not os.path.exists(docs_path):
            docs_path = replicate(spark, "documents", f, ["doc_id"])
        ev_path = replicate(spark, "events", f, ["event_id", "user_id"])
        docs = spark.read.parquet(docs_path).select("doc_id", "source")
        ev = spark.read.parquet(ev_path)
        r = {}

        # scan-stage canonicalizer — must ride the scan, ~linear
        url = U.synthetic_url(F.col("doc_id"))
        norm = docs.select(
            "doc_id", url.alias("url"),
            U.canonical_url(url).alias("url_canonical"),
            U.canonical_host(url).alias("host"))
        r["url_norm"] = timed("un", norm)

        # one hash-agg with a distinct expand — ~linear
        r["url_domain"] = timed("ud", norm.groupBy("host").agg(
            F.count("*").alias("n"),
            F.countDistinct("url_canonical").alias("u")))

        # host-keyed row_number cap — one exchange, ~linear
        wc = Window.partitionBy("host").orderBy(
            F.md5(F.col("doc_id").cast("string")), F.col("doc_id"))
        r["host_cap"] = timed("hc", norm
                              .withColumn("rk", F.row_number().over(wc))
                              .filter(F.col("rk") <= 8)
                              .select("doc_id", "host", "rk"))

        # first-5 path window + same-key groupBy — one exchange
        wp = Window.partitionBy("user_id").orderBy("ts", "event_id")
        steps = (ev.select("user_id", "ts", "event_id", "event_type")
                 .withColumn("_rn", F.row_number().over(wp))
                 .filter(F.col("_rn") <= 5))
        paths = steps.groupBy("user_id").agg(
            F.concat_ws(">", F.transform(
                F.array_sort(F.collect_list(
                    F.struct("_rn", "event_type"))),
                lambda s: s["event_type"])).alias("path"))
        r["path_topk"] = timed("pt", paths.groupBy("path").agg(
            F.count("*").alias("n_users")))

        # prefix-max window + per-user agg — one exchange
        v_e2 = F.round(F.col("value") * 100).cast("long")
        wd = (Window.partitionBy("user_id").orderBy("ts", "event_id")
              .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        dd = ev.select("user_id", v_e2.alias("_v"),
                       (F.max(v_e2).over(wd) - v_e2).alias("_dd"))
        r["drawdown"] = timed("dd", dd.groupBy("user_id").agg(
            F.count("*").alias("n"), F.max("_v").alias("p"),
            F.max("_dd").alias("m")))

        # bounded-explode stickiness: constant-30 fanout — ~linear
        days = (ev.select("user_id", F.to_date("ts").alias("d"))
                .distinct())
        dau = days.groupBy("d").agg(F.count("*").alias("dau"))
        contrib = days.select(
            "user_id",
            F.explode(F.sequence(F.col("d"), F.date_add("d", 29)))
            .alias("md"))
        mau = (contrib.distinct()
               .join(dau.select(F.col("d").alias("md")), "md")
               .groupBy("md").agg(F.count("*").alias("mau")))
        r["stickiness"] = timed("st", dau.join(
            mau, dau["d"] == mau["md"]))

        # retention triangle: distinct + same-key min + equi-join
        wk = (F.datediff(F.to_date("ts"),
                         F.lit("1970-01-01").cast("date")) / 7) \
            .cast("long")
        uw = ev.select("user_id", wk.alias("wk")).distinct()
        cohort = uw.groupBy("user_id").agg(F.min("wk").alias("cw"))
        r["retention_tri"] = timed("rt", uw.join(cohort, "user_id")
                                   .groupBy("cw", (F.col("wk")
                                                   - F.col("cw")))
                                   .agg(F.count("*").alias("n")))

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
