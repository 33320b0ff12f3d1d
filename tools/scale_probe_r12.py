"""Focused scale runner for the round-12 operator family (the
freeze-lift batch: CCNet paragraph ops, cross-split contamination,
source similarity, embedding label QA, events/TPC-H analytics).

Reuses the replicated parquet under /tmp and deep-merges per-op rows
into scale_results.json (scale_probe_r8.py discipline: per-op ratios
only, never cross-op totals).

winnow_split_contamination is probed to 4x ON PURPOSE: replication
multiplies exact-duplicate families, so the TRUE cross-split pair
count grows ~quadratically in the factor (every copy shares
fingerprints with every other copy) — the op is linear in pairs, not
docs (the edit_distance_pairs precedent, SCALE.md r9).

vocab_jaccard_sources note: replication repeats the same TEXT, so
the distinct (source, word) projection's OUTPUT is constant while
its input grows — the probe measures the scan+distinct cost, which
is the 100 TB cost (the pair join is bounded by sources² always).

Usage: python tools/scale_probe_r12.py [factors...] (default 1 4 16)
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

from goka_spark.session import get_session  # noqa: E402


def main():
    factors = [int(x) for x in sys.argv[1:]] or [1, 4, 16]
    spark = get_session("scale_probe_r12")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    from goka_spark.functions import dedup as D
    from goka_spark.queries.llmdata import _paragraph_frame

    results = {}
    for f in factors:
        docs = spark.read.parquet(replicate(
            spark, "documents", f, ["doc_id"]))
        ev = spark.read.parquet(replicate(
            spark, "events", f, ["event_id", "user_id"]))
        orders = spark.read.parquet(replicate(
            spark, "orders", f, ["o_orderkey", "o_custkey"]))
        lineitem = spark.read.parquet(replicate(
            spark, "lineitem", f, ["l_orderkey"]))
        emb = spark.read.parquet(replicate(
            spark, "embeddings", f, ["vec_id"]))
        r = {}

        # paragraph frame + corpus freq + per-doc agg: one explode +
        # one (h) hash-agg + join back — expect ~linear in paragraphs
        ph = _paragraph_frame(docs)
        pf = ph.groupBy("h").agg(F.count("*").alias("freq"),
                                 F.min("doc_id").alias("first_doc"))
        r["ccnet_paragraph_dedup"] = timed("ccp", ph.join(pf, "h")
            .groupBy("doc_id")
            .agg(F.count("*").alias("n"),
                 F.sum((F.col("freq") >= 2).cast("long")).alias("d")))

        # + the per-doc ordered rebuild (sort_array over collect_list
        # of the doc's own paragraphs — partition-local)
        keep = (F.col("freq") == 1) | (F.col("doc_id")
                                       == F.col("first_doc"))
        j = ph.join(pf, "h").withColumn("_k", keep)
        kept = F.transform(
            F.array_sort(F.collect_list(
                F.when(F.col("_k"), F.struct("pos", "para")))),
            lambda s: s["para"])
        r["paragraph_prune_text"] = timed("ppt", j.groupBy("doc_id")
            .agg(F.md5(F.array_join(kept, " ")).alias("m")))

        # winnow cross-split pairs: 4x cap (see module docstring)
        if f <= 4:
            pairs = D.winnow_overlap_pairs(docs, "doc_id", "text")
            is_ea = (F.col("id_a") % 10) >= 8
            is_eb = (F.col("id_b") % 10) >= 8
            r["winnow_split_contamination"] = timed(
                "wsc", pairs.filter(is_ea != is_eb)
                .groupBy(F.when(is_ea, F.col("id_a"))
                         .otherwise(F.col("id_b")).alias("e"))
                .agg(F.sum("shared_fp").alias("s")))

        # MSTTR: pure scan-stage array algebra — expect linear
        words = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
        nseg = (F.size(words) / 25).cast("long")
        base = docs.select("doc_id", words.alias("_ws"),
                           nseg.alias("_n")).filter(F.col("_n") >= 1)
        segd = F.transform(
            F.sequence(F.lit(0), F.col("_n") - 1),
            lambda i: F.size(F.array_distinct(
                F.slice(F.col("_ws"), i * 25 + 1, 25))).cast("long"))
        r["msttr"] = timed("ms", base.select(
            "doc_id", F.aggregate(segd, F.lit(0).cast("long"),
                                  lambda a, x: a + x).alias("t")))

        # corpus-derived stopword coverage: postings df agg + top-30
        # broadcast membership — linear in tokens
        tok = docs.select("doc_id", "source",
                          F.explode(words).alias("w"))
        df_ = (tok.select("doc_id", "w").distinct()
               .groupBy("w").agg(F.count("*").alias("df")))
        rk = Window.orderBy(F.desc("df"), F.asc("w"))
        stop = (df_.withColumn("_rn", F.row_number().over(rk))
                .filter(F.col("_rn") <= 30)
                .select("w", F.lit(1).alias("_s")))
        r["stopword_profile"] = timed("sw", tok
            .join(F.broadcast(stop), "w", "left")
            .groupBy("source")
            .agg(F.sum(F.coalesce("_s", F.lit(0))).alias("n")))

        # source-level minhash similarity: signature agg linear in
        # postings; the pair side is sources²·perms — constant
        sigs = D.minhash_signatures(docs, "doc_id", "text",
                                    num_perm=16, base_hash="md5")
        src = docs.select("doc_id", "source")
        ss = (sigs.join(src, "doc_id")
              .select("source", F.posexplode("minhash"))
              .groupBy("source", "pos").agg(F.min("col").alias("s")))
        a, b = ss.alias("a"), ss.alias("b")
        r["source_minhash_sim"] = timed("sms", a.join(b, "pos")
            .filter(F.col("a.source") < F.col("b.source"))
            .groupBy("a.source", "b.source")
            .agg(F.sum((F.col("a.s") == F.col("b.s")).cast("long"))
                 .alias("m")))

        # exact vocab Jaccard: the scan+distinct is the cost (output
        # constant under replication — same text repeated)
        tv = docs.select("source", F.explode(words).alias("w")) \
            .distinct()
        ta, tb = tv.alias("a"), tv.alias("b")
        r["vocab_jaccard_sources"] = timed("vj", ta.join(tb, "w")
            .filter(F.col("a.source") < F.col("b.source"))
            .groupBy("a.source", "b.source")
            .agg(F.count("*").alias("c")))

        # embedding label centroids + silhouette: one explode + two
        # hash-aggs + a labels×dims broadcast scan — linear in vecs
        ex = emb.select("vec_id", "label", F.posexplode("embedding"))
        e3 = F.floor(F.col("col").cast("double") * 1000 + 0.5) \
            .cast("long")
        ev3 = ex.select("vec_id", "label", "pos", e3.alias("e"))
        cent = (ev3.groupBy("label", "pos")
                .agg(F.count("*").alias("n"), F.sum("e").alias("s"))
                .select("label", "pos",
                        F.expr("s DIV n").alias("m")))
        c2 = cent.select(F.col("label").alias("cl"), "pos", "m")
        d = F.col("e") - F.col("m")
        r["embedding_silhouette"] = timed("sil", ev3
            .join(F.broadcast(c2), "pos")
            .groupBy("vec_id", "label", "cl")
            .agg(F.sum(d * d).alias("d2")))

        # events: per-user entropy + burstiness (two hash-aggs and a
        # per-user window over ordered events) — linear in events
        ut = ev.groupBy("user_id", "event_type") \
            .agg(F.count("*").alias("c"))
        t6 = F.floor(1e6 * F.col("c") * F.log(F.col("c")) + 0.5) \
            .cast("long")
        r["user_event_entropy"] = timed("ue", ut.groupBy("user_id")
            .agg(F.sum("c").alias("n"), F.sum(t6).alias("t")))
        wg = Window.partitionBy("user_id").orderBy("ts", "event_id")
        gap = ((F.unix_micros(F.col("ts"))
                - F.unix_micros(F.lag("ts").over(wg))) / 60000000) \
            .cast("long")
        r["interarrival_burstiness"] = timed("ib", ev
            .select("user_id", gap.alias("g"))
            .filter(F.col("g").isNotNull())
            .groupBy("user_id")
            .agg(F.count("*").alias("n"), F.sum("g").alias("sg"),
                 F.sum(F.col("g") * F.col("g")).alias("s2")))

        # TPC-H: fanout histogram (fact join + two hash-aggs) and
        # priority latency quantiles (bounded distinct-day windows)
        per = (orders.join(
            lineitem, F.col("o_orderkey") == F.col("l_orderkey"),
            "left")
            .groupBy("o_orderkey")
            .agg(F.count("l_orderkey").alias("fan")))
        r["order_fanout_histogram"] = timed("of", per
            .groupBy("fan").agg(F.count("*").alias("n")))
        delay = F.datediff(F.col("l_shipdate").cast("date"),
                           F.col("o_orderdate").cast("date")) \
            .cast("long")
        byd = (lineitem
               .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
               .groupBy("o_orderpriority", delay.alias("d"))
               .agg(F.count("*").alias("cnt")))
        wc = (Window.partitionBy("o_orderpriority").orderBy("d")
              .rowsBetween(Window.unboundedPreceding, 0))
        r["priority_latency_quantiles"] = timed("pl", byd
            .withColumn("_c", F.sum("cnt").over(wc)))

        results[f"x{f}"] = r
        print(f"x{f}: {json.dumps(r)}")

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
