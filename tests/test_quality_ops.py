"""Entropy / blocklist / heavy-hitter / cluster-balanced-sample ops.

Oracle hash-equivalence runs in tools/verify_local.py and the driver;
these tests pin the semantic properties and plan shapes: entropy
bounds and exactness vs a pure-Python reference, the blocklist's
integer boundary verdict and zero-shuffle plan, common_ngrams'
deterministic total order, and the sampler's cap policy + stability.
"""

import math

import pytest
from pyspark.sql import functions as F

from goka_spark.functions import dedup as D
from goka_spark.functions import similarity as S
from goka_spark.functions import text as T
from goka_spark.plans import explain as X
from goka_spark.queries.base import load


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load(spark, sf_dir, "documents")["documents"]


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load(spark, sf_dir, "embeddings")["embeddings"]


# --------------------------------------------------------- entropy

def test_word_entropy_matches_pure_python(spark):
    texts = ["a a a a", "a b c d", "a a b b c", "x", "", "  ",
             "the the quick quick quick fox"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           T.word_entropy(df, "doc_id", "text").collect()}
    for i, t in enumerate(texts):
        ws = [w for w in t.split() if w]
        n = len(ws)
        row = got[i]
        assert row["n_tokens"] == n
        assert row["n_distinct"] == len(set(ws))
        if n == 0:
            assert row["entropy"] is None
            continue
        clnc = sum(
            math.floor(1e6 * ws.count(w) * math.log(ws.count(w)) + 0.5)
            for w in set(ws))
        want = math.log(n) - clnc / 1e6 / n
        assert row["entropy"] == pytest.approx(want, abs=1e-12)


def test_word_entropy_bounds(docs):
    out = T.word_entropy(docs, "doc_id", "text").filter("n_tokens > 0")
    # 0 <= H <= ln(n_distinct) (+1 micro-nat of rounding slack)
    bad = out.filter(
        (F.col("entropy") < -1e-6)
        | (F.col("entropy") > F.log(F.col("n_distinct")) + 1e-6)).count()
    assert bad == 0
    # degenerate doc pins H = 0 exactly at the integer level
    one = out.filter(F.col("n_distinct") == 1)
    if one.count():
        assert one.filter(F.abs("entropy") > 1e-6).count() == 0


# ------------------------------------------------------- blocklist

def test_blocklist_hits_counts_and_boundary(spark):
    df = spark.createDataFrame(
        [(0, "bad ok ok ok"),          # 1/4 hits -> ratio .25 > .05
         (1, "ok " * 19 + "bad"),      # 1/20 = exactly max_ratio -> keep
         (2, "clean words only"),
         (3, "bad bad worse ok")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           T.blocklist_hits(df, "doc_id", "text", ["bad", "worse"],
                            max_ratio_e6=50_000).collect()}
    assert (out[0]["hits_total"], out[0]["keep"]) == (1, False)
    # boundary: hits*1e6 == ratio_e6*n  ->  kept (<=, not <)
    assert (out[1]["n_words"], out[1]["keep"]) == (20, True)
    assert (out[2]["hits_total"], out[2]["keep"]) == (0, True)
    assert (out[3]["hits_total"], out[3]["hits_distinct"]) == (3, 2)


def test_blocklist_plan_zero_shuffle(docs):
    out = T.blocklist_hits(docs, "doc_id", "text", ["slow", "hash"])
    assert X.num_shuffles(out) == 0


# ---------------------------------------------------- common_ngrams

def test_common_ngrams_exact_and_deterministic(spark):
    rows = [(0, "a b c a b c"), (1, "a b c d e"), (2, "a b c x y"),
            (3, "q r s t u"), (4, "q r s v w")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = D.common_ngrams(df, "doc_id", "text", n=3, k=3, min_df=2)
    got = [(r["ngram"], r["df"]) for r in
           out.orderBy(F.desc("df"), "ngram").collect()]
    # 'a b c' in docs 0,1,2 (distinct per doc); 'q r s' in 3,4
    assert got[0] == ("a b c", 3)
    assert ("q r s", 2) in got
    # deterministic under re-run (total order incl. the tie tail)
    again = [(r["ngram"], r["df"]) for r in
             D.common_ngrams(df, "doc_id", "text", n=3, k=3, min_df=2)
             .orderBy(F.desc("df"), "ngram").collect()]
    assert got == again


def test_common_ngrams_top_k_no_global_sort(docs):
    out = D.common_ngrams(docs, "doc_id", "text", n=3, k=20)
    # global top-k must plan as TakeOrderedAndProject, not a full sort
    assert "TakeOrderedAndProject" in X.simple(out)


# ------------------------------------------- cluster-balanced sample

def test_cluster_sample_policy(emb):
    out = S.cluster_balanced_sample(emb, "vec_id", "embedding",
                                    per_cluster=6, bits=6)
    n = emb.count()
    assert out.count() == n  # verdict for every vector
    # clusters within the cap are kept whole
    whole = out.filter(F.col("n_cluster") <= 6)
    assert whole.filter(~F.col("keep")).count() == 0
    # over-full clusters: realized keep is Binomial(n_c, cap/n_c);
    # check the policy direction, not the realization: kept <= n_c
    # and at least one over-full cluster down-samples on real data
    over = (out.filter(F.col("n_cluster") > 6)
            .groupBy("cluster", "n_cluster")
            .agg(F.sum(F.col("keep").cast("int")).alias("kept")))
    rows = over.collect()
    assert rows, "test corpus should have at least one over-full cluster"
    assert all(r["kept"] <= r["n_cluster"] for r in rows)
    assert any(r["kept"] < r["n_cluster"] for r in rows)


def test_cluster_sample_stable_under_growth(emb):
    """Adding vectors can change RATES, but a kept id with an
    unchanged rate never flips: membership is slot < rate, slot a
    pure function of the id."""
    sub = emb.filter(F.col("vec_id") < 200)
    full = S.cluster_balanced_sample(emb, "vec_id", "embedding", 6)
    part = S.cluster_balanced_sample(sub, "vec_id", "embedding", 6)
    j = (part.alias("p").join(full.alias("f"), "vec_id")
         .filter(F.col("p.cluster") != F.col("f.cluster")).count())
    assert j == 0  # cluster id depends only on the vector


def test_cluster_sample_broadcast_rates(emb):
    out = S.cluster_balanced_sample(emb, "vec_id", "embedding", 6)
    assert X.has_broadcast_join(out)


# ------------------------------------------------------- nb_classify

def test_nb_classify_learns_planted_signal(spark):
    """When vocabulary genuinely predicts the label, the NB scorer
    must separate held-out docs (the synthetic corpus has no such
    signal, so the registry run only proves the mechanics)."""
    rows = []
    for i in range(120):
        good = i % 2 == 0
        base = ("excellent prose with informative structured content"
                if good else "buy cheap pills click here spam offer")
        rows.append((i, f"{base} filler{i % 7} tail{i % 5}", good))
    df = spark.createDataFrame(rows, ["doc_id", "text", "y"])
    out = T.nb_classify(df, "doc_id", "text",
                        label=F.col("y").cast("int") == 1,
                        train_pred=F.col("doc") % 3 == 0)
    held = (out.join(df.select("doc_id", "y"), "doc_id")
            .filter(F.col("doc_id") % 3 != 0))
    acc = held.agg(F.avg((F.col("predicted") == F.col("y").cast("long"))
                         .cast("double"))).first()[0]
    assert acc == 1.0


def test_nb_classify_prior_only_for_featureless_doc(spark):
    """A doc with no tokens scores exactly the class prior."""
    df = spark.createDataFrame(
        [(0, "alpha beta", True), (1, "alpha gamma", False), (2, "", True)],
        ["doc_id", "text", "y"])
    out = T.nb_classify(df, "doc_id", "text",
                        label=F.col("y").cast("int") == 1,
                        train_pred=F.col("doc") < 2)
    empty = out.filter(F.col("doc_id") == 2).first()
    # prior with n_pos=1, n_train=2: ln(2/4) - ln(2/4) = 0
    assert empty["score_e6"] == 0 and empty["predicted"] == 0


# ------------------------------------------------- gopher_repetition

def test_gopher_repetition_planted(spark):
    df = spark.createDataFrame(
        [(1, "spam ham " * 30),
         (2, "all words here are totally distinct tokens without any "
             "repeats whatsoever thanks")],
        ["doc_id", "text"])
    out = {r["doc_id"]: r
           for r in T.gopher_repetition(df, "doc_id", "text").collect()}
    looped, clean = out[1], out[2]
    # a looped doc is fully covered by duplicated 5-grams
    assert looped["dup5_frac_e6"] == 1_000_000
    assert looped["top2_frac_e6"] >= 500_000
    assert looped["keep"] == 0
    # a distinct-word doc has zero dup coverage
    assert clean["dup5_frac_e6"] == 0 and clean["dup10_frac_e6"] == 0


def test_gopher_repetition_no_double_count(spark):
    """Overlapping occurrences of duplicated grams cover each word
    once: 'a b a b a b' has dup 2-grams at every position but only
    6 words of coverage."""
    df = spark.createDataFrame([(1, "a b a b a b")], ["doc_id", "text"])
    r = T.gopher_repetition(df, "doc_id", "text",
                            top_ns=(2,), dup_ns=(2,)).first()
    assert r["chars"] == 6
    assert r["dup2_frac_e6"] == 1_000_000  # covered == all, not > all


# ---------------------------------------------- line_quality_filter

def test_line_quality_rules(spark):
    df = spark.createDataFrame(
        [(1, "This line is long enough to survive the filter.\n"
             "short line\n"
             "No terminal punctuation here so it dies when required\n"
             "A spam offer inside this nice long sentence stays "
             "unless blocked.")],
        ["doc_id", "text"])
    base = T.line_quality_filter(df, "doc_id", "text", min_words=4).first()
    assert base["lines_total"] == 4 and base["lines_removed"] == 1
    punct = T.line_quality_filter(df, "doc_id", "text", min_words=4,
                                  require_end_punct=True).first()
    assert punct["lines_removed"] == 2
    blocked = T.line_quality_filter(df, "doc_id", "text", min_words=4,
                                    blocklist=["spam"]).first()
    assert blocked["lines_removed"] == 2
    # blocklist hits are exact tokens, never substrings
    sub = T.line_quality_filter(df, "doc_id", "text", min_words=4,
                                blocklist=["spa"]).first()
    assert sub["lines_removed"] == 1


# ------------------------------------------------ perplexity_buckets

def test_perplexity_terciles_are_even(spark, docs):
    out = T.perplexity_buckets(docs, "doc_id", "text")
    counts = {r["bucket"]: r["n"] for r in
              out.groupBy("bucket").agg(F.count("*").alias("n")).collect()}
    scored = sum(v for k, v in counts.items() if k != "unscored")
    for b in ("head", "middle", "tail"):
        assert abs(counts.get(b, 0) - scored / 3) <= 2, counts
    # bucket thresholds are inclusive-ordered: every head doc scores
    # >= every tail doc
    lm = T.lm_logprob(docs, "doc_id", "text") \
        .select("doc_id", "avg_logprob",
                F.col("n_bigrams").alias("_nb"))
    j = out.select("doc_id", "bucket").join(lm, "doc_id") \
        .filter(F.col("_nb") > 0)
    head_min = j.filter(F.col("bucket") == "head") \
        .agg(F.min("avg_logprob")).first()[0]
    tail_max = j.filter(F.col("bucket") == "tail") \
        .agg(F.max("avg_logprob")).first()[0]
    assert head_min >= tail_max


def test_line_quality_noop_rule_roundtrips(spark):
    """min_words=0 keeps every line and rebuilds the text exactly."""
    df = spark.createDataFrame(
        [(1, "first line here\n\nthird after an empty line")],
        ["doc_id", "text"])
    r = T.line_quality_filter(df, "doc_id", "text", min_words=0).first()
    assert r["clean_text"] == "first line here\n\nthird after an empty line"
    assert r["lines_removed"] == 0


# ------------------------------------------------- count-min sketch

def test_cms_never_undercounts(spark, docs):
    """est >= true for EVERY distinct item (the CMS guarantee), and
    est == true for items whose buckets had no collisions."""
    postings = D.shingle_postings(docs, "doc_id", "text", 3)
    sk = D.cms_sketch(postings, "sh", depth=4, width=512)
    truth = postings.groupBy("sh").agg(F.count("*").alias("df"))
    est = D.cms_estimate(sk, truth.select("sh"), "sh",
                         depth=4, width=512)
    j = truth.join(est, "sh")
    under = j.filter(F.col("cms_est") < F.col("df")).count()
    assert under == 0
    # overcount is bounded by the CMS expectation: per row ~N/width,
    # the min over 4 rows well under it on average
    n = postings.count()
    avg_over = j.agg(F.avg(F.col("cms_est") - F.col("df"))).first()[0]
    assert avg_over <= 3 * n / 512


def test_cms_sketch_is_bounded(spark, docs):
    postings = D.shingle_postings(docs, "doc_id", "text", 3)
    sk = D.cms_sketch(postings, "sh", depth=4, width=256)
    assert sk.count() <= 4 * 256
    # total mass per row == number of postings
    n = postings.count()
    per_row = sk.groupBy("row").agg(F.sum("cnt").alias("m")).collect()
    assert all(r["m"] == n for r in per_row)


def test_cms_sketches_merge_cellwise(spark, docs):
    """sketch(A) + sketch(B) cell-wise == sketch(A ∪ B): the
    distributive property that lets every shard sketch independently
    and a driver (or tree-reduce) merge depth×width integers."""
    postings = D.shingle_postings(docs, "doc_id", "text", 3)
    a = postings.filter(F.col("doc") % 2 == 0)
    b = postings.filter(F.col("doc") % 2 != 0)
    merged = (D.cms_sketch(a, "sh", width=256)
              .unionByName(D.cms_sketch(b, "sh", width=256))
              .groupBy("row", "bucket").agg(F.sum("cnt").alias("cnt")))
    whole = D.cms_sketch(postings, "sh", width=256)
    diff = (merged.join(whole, ["row", "bucket"], "full")
            .filter(F.coalesce(merged["cnt"], F.lit(0))
                    != F.coalesce(whole["cnt"], F.lit(0))).count())
    assert diff == 0


def test_streaming_cms_sink_equals_batch_sketch(spark, tmp_path):
    """Two micro-batches through the CMS sink merge to exactly the
    batch sketch of the union, and estimates never undercount."""
    from goka_spark.streaming.runtime import stream_from_dir

    schema = "doc_id long, sh string"
    rows1 = [(1, "a b c"), (2, "a b c"), (3, "x y z")]
    rows2 = [(4, "a b c"), (5, "p q r")]
    src = str(tmp_path / "grams")
    spark.createDataFrame(rows1, schema).coalesce(1) \
        .write.mode("append").parquet(src)

    sink = D.CmsSink(str(tmp_path / "cms"), "sh", depth=4, width=64)
    q = (stream_from_dir(spark, src, schema).writeStream
         .foreachBatch(sink)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .start())
    try:
        q.processAllAvailable()
        spark.createDataFrame(rows2, schema).coalesce(1) \
            .write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    whole = D.cms_sketch(
        spark.createDataFrame(rows1 + rows2, schema), "sh",
        depth=4, width=64)
    live = sink.read(spark)
    diff = (live.join(whole, ["row", "bucket"], "full")
            .filter(F.coalesce(live["cnt"], F.lit(0))
                    != F.coalesce(whole["cnt"], F.lit(0))).count())
    assert diff == 0
    est = {r["sh"]: r["cms_est"] for r in sink.estimate(
        spark, spark.createDataFrame([("a b c",), ("p q r",)], ["sh"]),
        "sh").collect()}
    assert est["a b c"] >= 3 and est["p q r"] >= 1


# ------------------------------------------------------ portable HLL

def test_hll_accuracy_and_merge(spark):
    """Estimate within the m=256 error envelope on three magnitudes,
    and shard registers merge by cell-wise MAX (== whole)."""
    for n in (100, 1000, 10000):
        df = spark.range(n).select(
            F.lit("k").alias("g"), F.col("id").alias("u"))
        est = D.hll_estimate(
            D.hll_registers(df, ["g"], "u"), ["g"]).first()["hll_est"]
        assert abs(est - n) / n < 0.2, (n, est)
    df = spark.range(2000).select(F.lit("k").alias("g"),
                                  F.col("id").alias("u"))
    a = D.hll_registers(df.filter(F.col("u") % 2 == 0), ["g"], "u")
    b = D.hll_registers(df.filter(F.col("u") % 2 != 0), ["g"], "u")
    merged = (a.unionByName(b).groupBy("g", "reg")
              .agg(F.max("r").alias("r")))
    whole = D.hll_registers(df, ["g"], "u")
    diff = (merged.join(whole, ["g", "reg"], "full")
            .filter(F.coalesce(merged["r"], F.lit(0))
                    != F.coalesce(whole["r"], F.lit(0))).count())
    assert diff == 0


def test_cms_sketch_single_scan_plan(spark, docs):
    """r7: the sketch must scan the item stream ONCE (explode of a
    depth-length struct array), not depth× (the pre-r7 union shape) —
    at 100 TB the gram stream is the dominant cost."""
    postings = D.shingle_postings(docs, "doc_id", "text", 3)
    plan = D.cms_sketch(postings, "sh", depth=4, width=256) \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Union") == 0
    assert plan.count("Generate explode") == 1
    # same single-scan discipline on the estimate side
    q = spark.createDataFrame([("a b c",)], ["sh"])
    sk = D.cms_sketch(postings, "sh", depth=4, width=256)
    eplan = D.cms_estimate(sk, q, "sh", depth=4, width=256) \
        ._jdf.queryExecution().executedPlan().toString()
    assert eplan.count("Union") == 0


def test_hll_estimate_partition_order_invariant(spark):
    """r7 (ADVICE): the harmonic sum is aggregated as an exact BIGINT
    Σ2^(49-r), so the estimate is bit-identical regardless of
    partition count / partial-agg order — including a register spread
    wide enough (r=1 … r=49) that a double summation differed by
    1 ulp."""
    rows = ([("k", 0, 1)] * 1 + [("k", i, 1) for i in range(1, 200)]
            + [("k", 200, 49)])
    df = spark.createDataFrame(rows, "g string, reg int, r int") \
        .groupBy("g", "reg").agg(F.max("r").alias("r"))
    ests = set()
    for parts in (1, 7, 32):
        e = D.hll_estimate(df.repartition(parts), ["g"]).first()["hll_est"]
        ests.add(e)
    assert len(ests) == 1, ests


def test_streaming_hll_sink_equals_batch(spark, tmp_path):
    """Two micro-batches through the HLL sink merge (cell-wise MAX)
    to exactly the batch registers of the union, so the streamed
    estimate equals the batch estimate."""
    from goka_spark.streaming.runtime import stream_from_dir

    schema = "event_type string, user_id long"
    rows1 = [("click", i) for i in range(200)] + [("view", 7)]
    rows2 = [("click", i) for i in range(100, 400)] + [("view", 9)]
    src = str(tmp_path / "events")
    spark.createDataFrame(rows1, schema).coalesce(1) \
        .write.mode("append").parquet(src)

    sink = D.HllSink(str(tmp_path / "hll"), ["event_type"], "user_id")
    q = (stream_from_dir(spark, src, schema).writeStream
         .foreachBatch(sink)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .start())
    try:
        q.processAllAvailable()
        spark.createDataFrame(rows2, schema).coalesce(1) \
            .write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    whole_df = spark.createDataFrame(rows1 + rows2, schema)
    whole = D.hll_registers(whole_df, ["event_type"], "user_id")
    live = sink.read(spark)
    diff = (live.join(whole, ["event_type", "reg"], "full")
            .filter(F.coalesce(live["r"], F.lit(-1))
                    != F.coalesce(whole["r"], F.lit(-1))).count())
    assert diff == 0
    got = {r["event_type"]: r["hll_est"]
           for r in sink.estimate(spark).collect()}
    want = {r["event_type"]: r["hll_est"]
            for r in D.hll_estimate(whole, ["event_type"]).collect()}
    assert got == want


def test_streaming_histogram_sink_equals_batch(spark, tmp_path):
    """Two micro-batches through the histogram sink merge (cell-wise
    SUM) to exactly the batch bin counters of the union, so the
    streamed quantiles equal the batch quantiles."""
    from goka_spark.operators import windows as W
    from goka_spark.streaming.runtime import stream_from_dir

    schema = "event_type string, value double"
    rows1 = [("click", float(v)) for v in range(0, 300, 3)]
    rows2 = [("click", float(v)) for v in range(100, 512, 2)] \
        + [("view", 400.0)] * 10
    src = str(tmp_path / "events")
    spark.createDataFrame(rows1, schema).coalesce(1) \
        .write.mode("append").parquet(src)

    sink = W.HistogramSink(str(tmp_path / "hist"), "value",
                           ["event_type"], lo=0.0, hi=512.0,
                           n_bins=256)
    q = (stream_from_dir(spark, src, schema).writeStream
         .foreachBatch(sink)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .start())
    try:
        q.processAllAvailable()
        spark.createDataFrame(rows2, schema).coalesce(1) \
            .write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    whole_df = spark.createDataFrame(rows1 + rows2, schema)
    whole = W.histogram_bins(whole_df, "value", ["event_type"],
                             0.0, 512.0, 256)
    live = sink.read(spark)
    diff = (live.join(whole, ["event_type", "_bin"], "full")
            .filter(F.coalesce(live["_c"], F.lit(-1))
                    != F.coalesce(whole["_c"], F.lit(-1))).count())
    assert diff == 0
    got = {r["event_type"]: (r["p50"], r["p90"])
           for r in sink.quantiles(spark).collect()}
    want = {r["event_type"]: (r["p50"], r["p90"])
            for r in W.histogram_quantiles(
                whole_df, "value", ["event_type"],
                lo=0.0, hi=512.0, n_bins=256).collect()}
    assert got == want
