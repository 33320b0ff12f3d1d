"""Round-5 corpus-management + incremental/bloom dedup operators.

Oracle hash-equivalence runs in tools/verify_local.py / the driver;
these tests pin the SEMANTIC properties the hashes can't express:
split disjointness/stability, mixture policy optimality, incremental
verdicts on planted duplicates, and Bloom's no-false-negative bound.
"""

import pytest
from pyspark.sql import functions as F

from goka_spark.functions import corpus as C
from goka_spark.functions import dedup as D
from goka_spark.queries.base import load


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load(spark, sf_dir, "documents")["documents"]


# ----------------------------------------------------------- split

def test_hash_split_disjoint_exhaustive(docs):
    out = C.hash_split(docs, "doc_id")
    n = docs.count()
    assert out.count() == n                       # every doc assigned
    assert out.select("doc_id").distinct().count() == n  # exactly once
    names = {r["split"] for r in out.select("split").distinct().collect()}
    assert names <= {"train", "validation", "test"}


def test_hash_split_stable_under_corpus_growth(docs):
    """The property that keeps eval sets honest: adding documents
    never reassigns an existing one."""
    subset = docs.filter(F.col("doc_id") < 100)
    full = C.hash_split(docs, "doc_id")
    part = C.hash_split(subset, "doc_id")
    moved = (part.alias("p")
             .join(full.alias("f"), "doc_id")
             .filter(F.col("p.split") != F.col("f.split")).count())
    assert moved == 0


def test_hash_split_salt_rerolls(docs):
    a = C.hash_split(docs, "doc_id", salt="a")
    b = C.hash_split(docs, "doc_id", salt="b")
    same = (a.alias("a").join(b.alias("b"), "doc_id")
            .filter(F.col("a.split") == F.col("b.split")).count())
    assert same < docs.count()  # different salt -> different assignment


def test_hash_split_validates_permilles(docs):
    with pytest.raises(ValueError):
        C.hash_split(docs, "doc_id", splits=[("train", 990), ("test", 20)])


# ------------------------------------------------------------- mix

def test_mixture_rates_limiting_domain_kept_whole(docs):
    w = {f"src{i}": 20 - i for i in range(20)}
    rates = {r["source"]: r for r in
             C.mixture_rates(docs, "source", w).collect()}
    # uniform counts -> the max-weight domain limits; kept whole
    assert rates["src0"]["rate_e6"] == C.RATE_MOD
    assert rates["src0"]["target"] == rates["src0"]["n_docs"]
    # every other domain scales by w_s/w_limit exactly (n uniform)
    for i in range(1, 20):
        assert rates[f"src{i}"]["target"] == (25 * (20 - i)) // 20


def test_mixture_rates_match_pure_python(docs):
    w = {f"src{i}": (i * 7) % 13 + 1 for i in range(20)}
    counts = {r["source"]: r["n"] for r in
              docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    r_of = {s: (counts[s] * C.RATE_MOD) // w[s] for s in counts}
    lim = min(counts, key=lambda s: (r_of[s], s))
    n_l, w_l = counts[lim], w[lim]
    expect = {s: ((n_l * w[s]) // w_l * C.RATE_MOD) // counts[s]
              for s in counts}
    got = {r["source"]: r["rate_e6"] for r in
           C.mixture_rates(docs, "source", w).collect()}
    assert got == expect


def test_domain_mix_unweighted_domain_dropped(docs):
    w = {"src0": 1}  # every other source omitted -> dropped
    out = C.domain_mix(docs, "doc_id", "source", w)
    kept_sources = {r["source"] for r in out.select("source").distinct().collect()}
    assert kept_sources == {"src0"}
    assert out.count() == 25  # limiting (only) domain kept whole


def test_mixture_rates_rejects_nonpositive_weight(docs):
    with pytest.raises(ValueError):
        C.mixture_rates(docs, "source", {"src0": 0})


# ----------------------------------------------------- incremental

def test_incremental_dedup_planted_verdicts(spark):
    corpus = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog today"),
         (2, "completely different text about spark execution plans")],
        "doc_id long, text string")
    batch = spark.createDataFrame(
        [(10, "the quick brown fox jumps over the lazy dog today"),   # exact
         (11, "the quick brown fox jumps over the lazy dog tonight"),  # near
         (12, "unrelated words entirely novel content zero overlap here")],
        "doc_id long, text string")
    got = {r["doc_id"]: r["verdict"] for r in
           D.incremental_dedup(batch, corpus, "doc_id", "text").collect()}
    assert got[10] == "exact_dup"
    assert got[11] == "near_dup"
    assert got[12] == "new"


def test_incremental_dedup_covers_batch_exactly(docs):
    batch = docs.filter(F.col("doc_id") % 10 == 0)
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    out = D.incremental_dedup(batch, corpus, "doc_id", "text")
    assert out.count() == batch.count()
    assert out.select("doc_id").distinct().count() == batch.count()


# ----------------------------------------------------------- bloom

def test_bloom_no_false_negatives_vs_exact(docs):
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    bloom = D.bloom_decontaminate(corpus, bench, "doc_id", "text", n=3)
    exact = D.decontaminate(corpus, bench, "doc_id", "text", n=3)
    missing = exact.select("doc_id").subtract(bloom.select("doc_id")).count()
    assert missing == 0
    # per-doc: bloom hit count >= exact hit count (FPs only add)
    under = (exact.alias("e")
             .join(bloom.alias("b"), "doc_id")
             .filter(F.col("b.n_hits") < F.col("e.n_hits")).count())
    assert under == 0


def test_bloom_false_positive_rate_bounded(docs):
    """With m=2^17 bits and a few hundred benchmark grams, the FP
    rate is tiny — flagged-but-not-exact docs should be rare."""
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    bloom = D.bloom_decontaminate(corpus, bench, "doc_id", "text", n=3)
    exact = D.decontaminate(corpus, bench, "doc_id", "text", n=3)
    fp_docs = bloom.select("doc_id").subtract(exact.select("doc_id")).count()
    assert fp_docs <= max(2, corpus.count() // 100)


def test_bloom_tiny_filter_saturates_to_superset(spark):
    """Degenerate m: every bit set -> every gram 'hits' — documents
    the superset semantics rather than failing."""
    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string")
    bench = spark.createDataFrame(
        [(2, "one two three four five six seven")],
        "doc_id long, text string")
    out = D.bloom_decontaminate(corpus, bench, "doc_id", "text",
                                n=3, m_bits=2, k=1)
    assert out.count() == 1  # all grams collide at m=2


# ------------------------------------------------------ band planning

def test_optimal_bands_properties():
    from goka_spark.functions.dedup import optimal_bands

    for num_perm in (16, 32, 64, 128):
        prev_b = None
        for t in (0.1, 0.3, 0.5, 0.7, 0.9):
            b, r = optimal_bands(t, num_perm)
            assert b * r == num_perm
            # midpoint lands near the threshold
            assert abs((1.0 / b) ** (1.0 / r) - t) < 0.25
            # higher threshold -> fewer bands / longer rows (monotone)
            if prev_b is not None:
                assert b <= prev_b
            prev_b = b
    # spot values from the MMDS analysis: 0.5 with 32 perms -> b=8,r=4
    # has midpoint (1/8)^(1/4) ~= 0.59; b=16,r=2 -> 0.25 ; the closer
    # one to 0.5 must win
    b, r = optimal_bands(0.5, 32)
    assert (b, r) == (8, 4)


def test_optimal_bands_rejects_bad_threshold():
    import pytest as _pytest

    from goka_spark.functions.dedup import optimal_bands

    with _pytest.raises(ValueError):
        optimal_bands(0.0)
    with _pytest.raises(ValueError):
        optimal_bands(1.0)


def test_minhash_lsh_pairs_auto_banding(spark):
    near_a = "the quick brown fox jumps over the lazy dog again today"
    near_b = "the quick brown fox jumps over the lazy dog again tonight"
    df = spark.createDataFrame(
        [(1, near_a), (2, near_b),
         (3, "completely unrelated content about database query planners")],
        "doc_id long, text string")
    pairs = D.minhash_lsh_pairs(df, "doc_id", "text",
                                bands="auto", threshold=0.5).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(1, 2)}
    with pytest.raises(ValueError):
        D.minhash_lsh_pairs(df, "doc_id", "text", bands="auto")


def test_minhash_family_unbiased_under_small_hashes():
    """Regression for the r5 family fix: with p = 2^61-1 and a,b <
    2^31 the map (a*h+b) mod p almost never wrapped, so a shingle
    with a small base hash won the min under EVERY permutation and a
    J=0.8 pair agreed on ~2/32 signature slots.  With p just above
    the universe and full-range a,b, agreement must track Jaccard
    similarity even when one set holds an adversarially tiny hash."""
    import random

    from goka_spark.functions.dedup import HASH_P, _perm_params

    params = _perm_params(32)
    rng = random.Random(7)
    tot, trials = 0, 100
    for _ in range(trials):
        shared = [rng.randrange(0, 1 << 31) for _ in range(8)]
        a_set = shared + [rng.randrange(0, 1 << 25)]  # tiny hash
        b_set = shared + [rng.randrange(0, 1 << 31)]
        tot += sum(
            min((a * h + b) % HASH_P for h in a_set)
            == min((a * h + b) % HASH_P for h in b_set)
            for a, b in params)
    mean = tot / trials
    assert 23.0 < mean < 28.5, mean  # J=0.8 -> E[matches] ~= 25.6


def test_near_decontaminate_catches_paraphrase(spark):
    """A benchmark doc reworded at the tail (last token changed,
    shingle Jaccard ≈ 0.82) shares a minhash band at 8×2 banding →
    contaminated_near; the verbatim copy is contaminated_exact.
    Minhash is seeded, so the planted collision is deterministic."""
    bench = spark.createDataFrame(
        [(1000, "the quick brown fox jumps over the lazy dog "
                "every single morning")],
        "doc_id long, text string")
    corpus = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog "
             "every single morning"),                      # verbatim
         (2, "the quick brown fox jumps over the lazy dog "
             "every single evening"),                      # paraphrase
         (3, "completely unrelated text about spark plans "
             "and shuffle boundaries")],
        "doc_id long, text string")
    out = {r["doc_id"]: r["verdict"] for r in
           D.near_decontaminate(corpus, bench, "doc_id", "text",
                                num_perm=16, bands=8).collect()}
    assert out[1] == "contaminated_exact"
    assert out[2] == "contaminated_near"
    assert out[3] == "clean"


# ------------------------------------------------------ shuffle_order

def test_shuffle_is_exhaustive_permutation(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")["documents"]
    n = docs.count()
    out = C.shuffle_order(docs, "doc_id", n_shards=4)
    assert out.count() == n
    assert out.select("doc_id").distinct().count() == n
    # positions are contiguous 1..count(shard) per shard
    per = (out.groupBy("shard")
           .agg(F.count("*").alias("c"), F.max("pos").alias("m"),
                F.min("pos").alias("lo"),
                F.count_distinct("pos").alias("d")).collect())
    for r in per:
        assert r["lo"] == 1 and r["m"] == r["c"] == r["d"]


def test_shuffle_shard_stable_under_growth(spark, sf_dir):
    """Adding documents never moves an existing doc to another shard
    (its position may shift — that's the documented contract)."""
    docs = load(spark, sf_dir, "documents")["documents"]
    sub = docs.filter(F.col("doc_id") < 30)
    full = C.shuffle_order(docs, "doc_id", 4).select(
        "doc_id", F.col("shard").alias("s_full"))
    part = C.shuffle_order(sub, "doc_id", 4).select(
        "doc_id", F.col("shard").alias("s_part"))
    moved = (part.join(full, "doc_id")
             .filter(F.col("s_part") != F.col("s_full")).count())
    assert moved == 0


def test_shuffle_salt_rerolls_order(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")["documents"]
    a = C.shuffle_order(docs, "doc_id", 4, salt="a")
    b = C.shuffle_order(docs, "doc_id", 4, salt="b")
    same = (a.join(b, ["doc_id", "shard", "pos"]).count())
    assert same < docs.count() * 0.2  # overwhelmingly re-rolled


# ------------------------------------------- exact_dedup_prioritized

def test_priority_beats_min_id(spark):
    df = spark.createDataFrame(
        [(1, "same text", "srcA"), (2, "same text", "srcB"),
         (3, "same text", "srcB"), (9, "other", "srcA")],
        ["doc_id", "text", "source"])
    out = {x["dup_cnt"]: x for x in D.exact_dedup_prioritized(
        df, "doc_id", "text", "source", priority=("srcB",)).collect()}
    grp = out[3]
    # srcB outranks srcA despite doc 1 having the smaller id
    assert grp["keep_id"] == 2 and grp["keep_source"] == "srcB"
    assert grp["n_sources"] == 2
    # empty priority falls back to (source, id) order
    plain = {x["dup_cnt"]: x for x in D.exact_dedup_prioritized(
        df, "doc_id", "text", "source").collect()}
    assert plain[3]["keep_id"] == 1 and plain[3]["keep_source"] == "srcA"


# --------------------------------------------------- CorpusStatsSink

def test_streaming_corpus_stats_equals_batch(spark, tmp_path):
    """Two micro-batches through the stats sink merge to exactly the
    batch profile of the full data (associative partials)."""
    from goka_spark.streaming.runtime import stream_from_dir

    rows1 = [(1, "alpha beta gamma", "srcA", "en"),
             (2, "delta", "srcA", "en")]
    rows2 = [(3, "spark streaming stats", "srcA", "en"),
             (4, "ein zwei drei vier", "srcB", "de")]
    schema = "doc_id long, text string, source string, lang string"
    src = str(tmp_path / "topic")
    spark.createDataFrame(rows1, schema).coalesce(1) \
        .write.mode("append").parquet(src)

    sink = C.CorpusStatsSink(str(tmp_path / "stats"), "doc_id", "text")
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

    live = {(r["source"], r["lang"]): r for r in sink.read(spark).collect()}
    batch = spark.createDataFrame(rows1 + rows2, schema)
    ref = {(r["source"], r["lang"]): r
           for r in sink._partial(batch)
           .withColumn("mean_chars",
                       F.round(F.col("total_chars") / F.col("n_docs"), 4))
           .collect()}
    assert set(live) == set(ref)
    for k in ref:
        for c in ("n_docs", "total_tokens", "total_chars",
                  "min_chars", "max_chars", "mean_chars"):
            assert live[k][c] == ref[k][c], (k, c)


def test_streaming_quality_gate_sink_equals_batch(spark, tmp_path):
    """Two micro-batches through the gate sink merge (SUM) to exactly
    the batch per-gate counters of the union — the gates are
    stateless per doc, which is what makes the telemetry exact."""
    from goka_spark.functions import corpus as C
    from pyspark.sql import functions as F
    from goka_spark.streaming.runtime import stream_from_dir

    schema = "doc_id long, text string"
    good = "the quick brown fox jumps over the lazy dog again and again"
    rows1 = [(i, good + f" t{i}") for i in range(40)] \
        + [(100, "spam spam spam spam")]          # fails blocklist+rep
    rows2 = [(200 + i, good + f" u{i}") for i in range(30)] \
        + [(300, "x x x x x x x x")]              # fails entropy+rep
    src = str(tmp_path / "docs")
    spark.createDataFrame(rows1, schema).coalesce(1) \
        .write.mode("append").parquet(src)

    sink = C.QualityGateSink(str(tmp_path / "gates"), "doc_id", "text")
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

    whole = C.quality_gate_counts(
        spark.createDataFrame(rows1 + rows2, schema), "doc_id", "text")
    want = {r["gate"]: (r["n_pass"], r["n_docs"])
            for r in whole.collect()}
    got = {r["gate"]: (r["n_pass"], r["n_docs"])
           for r in sink.read(spark).collect()}
    assert got == want
    assert set(got) == {"repetition", "entropy", "blocklist"}
    assert all(n == 72 for _, n in got.values())
    rates = {r["gate"]: r["pass_e6"] for r in sink.rates(spark).collect()}
    assert rates["blocklist"] == 71 * 1_000_000 // 72
