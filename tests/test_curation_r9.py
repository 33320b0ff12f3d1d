"""Round-9 curation kernels: source-relative boilerplate, quantized-
gradient logistic regression, WHT perceptual hash, shot boundaries."""

import pytest
from pyspark.sql import functions as F

from goka_spark.functions import multimodal as M
from goka_spark.functions import text as T


def test_boilerplate_by_source_is_source_relative(spark):
    """The same line in two docs of src A (10 docs -> 20%) is boiler;
    the identical line spread over two docs of src B (100-doc source,
    2% < 4%) is not — the rule line_dedup_filter's global df can't
    express."""
    rows = [(i, "a", "nav bar\nbody %d" % i) for i in range(2)]
    rows += [(10 + i, "a", "only body %d" % i) for i in range(8)]
    rows += [(100 + i, "b", ("nav bar\n" if i < 2 else "") + "text %d" % i)
             for i in range(100)]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {r.doc_id: (r.n_lines, r.n_boiler, r.keep_ratio_e6)
           for r in T.boilerplate_by_source(
               docs, "doc_id", "text", "source",
               ratio_e6=40_000, min_df=2).collect()}
    assert got[0] == (2, 1, 500_000)       # nav bar boiler in src a
    assert got[1] == (2, 1, 500_000)
    assert got[10] == (1, 0, 1_000_000)
    assert got[100] == (2, 0, 1_000_000)   # same line, big src b: kept
    assert got[150] == (1, 0, 1_000_000)


def test_boilerplate_min_df_floor(spark):
    """A 2-doc source where every line trivially clears the ratio
    still needs df >= min_df: with min_df=3 nothing is boiler."""
    docs = spark.createDataFrame(
        [(1, "a", "x\ny"), (2, "a", "x\nz")],
        "doc_id long, source string, text string")
    got = {r.doc_id: r.n_boiler
           for r in T.boilerplate_by_source(
               docs, "doc_id", "text", "source",
               ratio_e6=40_000, min_df=3).collect()}
    assert got == {1: 0, 2: 0}


def test_logreg_learns_separable_labels(spark):
    """On a linearly separable toy set (label == long doc), 8 GD
    rounds reach 100% training accuracy and a positive length
    weight."""
    long_doc = " ".join(f"w{i}" for i in range(80))
    rows = [(i, "en" if i % 2 == 0 else "de",
             long_doc if i % 2 == 0 else "short text here")
            for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    ws, n, acc_e6 = T.logreg_train(docs, "doc_id", "text",
                                   F.col("lang") == "en")
    assert n == 40
    assert acc_e6 == 1_000_000
    assert ws[1] > 0  # x_len separates the classes


def test_logreg_deterministic_across_runs(spark):
    """Quantized gradients -> the trajectory is exactly reproducible
    (the property the SQL oracle depends on)."""
    rows = [(i, "en" if i % 3 else "fr", f"doc {i} " * (i % 7 + 1))
            for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    w1, _, a1 = T.logreg_train(docs, "doc_id", "text", F.col("lang") == "en")
    w2, _, a2 = T.logreg_train(docs, "doc_id", "text", F.col("lang") == "en")
    assert w1 == w2 and a1 == a2


def test_wht_hash_matches_closed_form(spark):
    """image_wht_hash on an 8x8 quad image == the popcount-parity
    closed form the oracle uses."""
    spec = spark.createDataFrame([(7, 8, 8, 3)],
                                 "doc_id long, w long, h long, seed long")
    blobs = M.encode_ppm_quad(spec, "doc_id", "w", "h", "seed")
    got = M.image_wht_hash(blobs).collect()[0].wht_hash

    def pc(x):
        return bin(x).count("1")

    want = 0
    for u in range(8):
        for v in range(8):
            k = u * 8 + v
            if k == 0:
                continue
            coef = sum(((r * 8 + c + 3) ** 2 % 256)
                       * (-1) ** ((pc(r & u) + pc(c & v)) % 2)
                       for r in range(8) for c in range(8))
            if coef > 0:
                want |= 1 << (k - 1)
    assert got == want


def test_wht_same_seed_collides_different_seed_separates(spark):
    spec = spark.createDataFrame(
        [(1, 8, 8, 5), (2, 8, 8, 5), (3, 8, 8, 9)],
        "doc_id long, w long, h long, seed long")
    hs = {r.doc_id: r.wht_hash for r in M.image_wht_hash(
        M.encode_ppm_quad(spec, "doc_id", "w", "h", "seed")).collect()}
    assert hs[1] == hs[2]
    assert hs[1] != hs[3]


def test_shot_boundaries_merge_identical_adjacent_shots(spark):
    """shot_len=2, seed_mod=2, 8 frames, doc_id=0: seeds
    0,0,1,1,0,0,1,1 -> 4 shots; the WITHIN-shot identical frames must
    NOT fire a boundary, the BETWEEN-shot changes must."""
    from pyspark.sql import Window
    spec = spark.createDataFrame([(0, 8)], "doc_id long, nf int")
    blobs = M.encode_ppm_stream_quad(spec, "doc_id", "nf",
                                     width=9, height=8, seed_mod=2,
                                     shot_len=2)
    fh = M.frame_dhash(blobs)
    w = Window.partitionBy("doc_id").orderBy("frame_idx")
    b = fh.withColumn("_prev", F.lag("dhash").over(w))
    n_shots = b.agg(F.lit(1) + F.sum(
        (F.col("_prev").isNotNull()
         & (F.col("dhash") != F.col("_prev"))).cast("long"))).collect()[0][0]
    assert n_shots == 4


def test_stream_quad_default_shot_len_unchanged(spark):
    """shot_len=1 (default) must reproduce the exact pre-r9 blobs —
    C129's certification depends on it."""
    spec = spark.createDataFrame([(5, 3)], "doc_id long, nf int")
    a = M.encode_ppm_stream_quad(spec, "doc_id", "nf", width=9, height=8,
                                 seed_mod=3).collect()[0].blob
    want = b"".join(M.ppm_encode_quad(9, 8, (5 + j) % 3) for j in range(3))
    assert bytes(a) == want


def test_weighted_jaccard_refines_set_jaccard(spark):
    """Two docs over the SAME vocabulary at similar repeat rates
    score high weighted Jaccard; a doc sharing the vocab once inside
    much more noise scores low — while their SET similarity to the
    base is identical."""
    from goka_spark.functions import dedup as D

    base = "alpha beta gamma delta " * 8
    same_rate = "alpha beta gamma delta " * 7 + "alpha beta gamma delta"
    rows = [(1, base), (2, same_rate)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.id_a, r.id_b): r.wj_e6
           for r in D.weighted_jaccard_pairs(
               docs, "doc_id", "text", n=3, threshold=0.05,
               max_df=None).collect()}
    # identical multisets -> wj = 1.0 exactly
    assert got[(1, 2)] == 1_000_000


def test_weighted_jaccard_counts_repeats(spark):
    """wj = sum(min)/sum(max) on counts: a={x:4,y:4}, b={x:4,y:1}
    -> 5/8 even though the SET jaccard is 1.0."""
    from goka_spark.functions import dedup as D

    a = "wordx wordy " * 4
    b = "wordx " * 4 + "wordy"
    docs = spark.createDataFrame([(1, a), (2, b)],
                                 "doc_id long, text string")
    got = D.weighted_jaccard_pairs(docs, "doc_id", "text", n=2,
                                   threshold=0.01, max_df=None).collect()
    assert [(r.id_a, r.id_b, r.wj_e6) for r in got] == [(1, 2, 625_000)]


def test_lang_confidence_margin_and_tie(spark):
    docs = spark.createDataFrame(
        [(1, "the cat and the dog of it is in"),   # clear en
         (2, "la la la"),                          # es/fr tie -> es, margin 0
         (3, "xyz qrs")],                          # all zero -> en, margin 0
        "doc_id long, text string")
    got = {r.doc_id: (r.lang, r.top_votes, r.margin)
           for r in T.lang_confidence(docs, "doc_id", "text").collect()}
    assert got[1][0] == "en" and got[1][2] > 0
    assert got[2] == ("es", 3, 0)
    assert got[3] == ("en", 0, 0)


def test_streaming_boilerplate_sink_equals_batch(spark, tmp_path):
    """Two micro-batches through BoilerplateSink merge to exactly the
    batch-derived boilerplate table (docs are epoch-disjoint, so the
    distinct-doc line counts SUM-merge), and the boiler verdicts
    match T.boilerplate_by_source's rule on the union."""
    from goka_spark.functions import corpus as C
    from goka_spark.streaming.runtime import stream_from_dir

    schema = "doc_id long, source string, text string"
    rows1 = [(1, "a", "nav bar\nbody one"), (2, "a", "nav bar\nbody two")]
    rows2 = [(3, "a", "nav bar\nbody three"), (4, "b", "nav bar\nother")]
    src = str(tmp_path / "topic")
    spark.createDataFrame(rows1, schema).coalesce(1) \
        .write.mode("append").parquet(src)

    sink = C.BoilerplateSink(str(tmp_path / "bp"), "doc_id", "text",
                             ratio_e6=40_000, min_df=2)
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

    live = {(r.source, r.line_h): (r.df, r.n_src_docs, r.boiler)
            for r in sink.read(spark).collect()}
    union = spark.createDataFrame(rows1 + rows2, schema)
    # batch reference: same counts via one pass over the union
    lines = (union.select(
        "doc_id", "source",
        F.explode(F.split("text", "\n")).alias("ln"))
        .filter(F.col("ln") != "")
        .select("doc_id", "source", F.md5(F.encode("ln", "UTF-8"))
                .alias("line_h")))
    nsrc = union.groupBy("source").agg(F.count("*").alias("n"))
    ref = {(r.source, r.line_h): (r.df, r.n, r.boiler)
           for r in (lines.groupBy("source", "line_h")
                     .agg(F.count_distinct("doc_id").alias("df"))
                     .join(nsrc, "source")
                     .select("source", "line_h", "df", "n",
                             ((F.col("df") * 1_000_000 >= 40_000 * F.col("n"))
                              & (F.col("df") >= 2)).alias("boiler"))
                     ).collect()}
    assert live == ref
    # the nav bar is boiler in src a (3/3 docs), not in src b (1 doc)
    nav_h = [k for k, v in ref.items() if v[0] >= 2]
    assert any(live[k][2] for k in nav_h if k[0] == "a")
    assert all(not v[2] for k, v in live.items() if k[0] == "b")


def test_hash_near_pairs_pigeonhole_complete(spark):
    """With max_hamming <= bands-1 the banded join must find EVERY
    qualifying pair: verify against brute force on crafted hashes
    (pairs at hamming 0, 3, 7 and one just over at 8)."""
    from goka_spark.functions import dedup as D

    base = 0b101010101010101010101010101010101010101010101010101010101010101
    rows = [(1, base), (2, base),                     # hamming 0
            (3, base ^ 0b111),                        # hamming 3 vs 1/2
            (4, base ^ ((1 << 62) | (1 << 31) | (1 << 15) | (1 << 7)
                        | 0b111)),                    # hamming 7 vs 3
            (5, base ^ ((1 << 60) | (1 << 53) | (1 << 46) | (1 << 39)
                        | (1 << 32) | (1 << 25) | (1 << 18) | (1 << 11)))]
    hashed = spark.createDataFrame(rows, "doc_id long, h long")
    got = {(r.id_a, r.id_b): r.hamming
           for r in D.hash_near_pairs(hashed, "doc_id", "h",
                                      max_hamming=7, bands=8).collect()}

    def pc(x):
        return bin(x).count("1")

    want = {(a, b): pc(ha ^ hb)
            for i, (a, ha) in enumerate(rows)
            for b, hb in rows[i + 1:]
            if pc(ha ^ hb) <= 7}
    assert got == want
    assert (1, 2) in got and got[(1, 2)] == 0
    assert (1, 3) in got and got[(1, 3)] == 3
    # doc 5 is at hamming 8 from 1/2 (one flip per band: every band
    # broken) — correctly absent
    assert not any(5 in k for k in got)


def test_lm_heldout_unseen_transitions_score_uniform(spark):
    """A test doc whose words never appear in train must score every
    transition at ln(1/V) (both counts 0) — the law self-scoring
    never exercises."""
    import math
    train = spark.createDataFrame(
        [(1, "aa bb cc dd"), (2, "aa bb dd ee")],
        "doc_id long, text string")
    test = spark.createDataFrame([(10, "zz yy xx")],
                                 "doc_id long, text string")
    got = T.lm_heldout_logprob(train, test, "doc_id", "text").collect()[0]
    v = 5  # distinct train words
    lp = math.floor(1e6 * math.log(1 / v) + 0.5)
    assert got.n_bigrams == 2
    assert got.logprob_e6 == 2 * lp


def test_stupid_backoff_branch_structure(spark):
    """Craft train/test so each branch fires: a trigram seen in
    train scores c3/c12; an unseen trigram with a seen (w2,w3) bigram
    takes the alpha branch; a fully-OOV word takes the Laplace
    floor."""
    import math
    train = spark.createDataFrame(
        [(1, "a b c d"), (2, "b c d e")], "doc_id long, text string")
    # test doc: trigram 'a b c' seen (branch 1: c3=1, c12=1);
    # trigram 'x b c' unseen but bigram 'b c' seen (branch 2:
    # c23=2, c(b)=2); trigram 'q q zz' fully OOV (branch 3)
    test = spark.createDataFrame(
        [(10, "a b c"), (11, "x b c"), (12, "q q zz")],
        "doc_id long, text string")
    got = {r.doc_id: r.logscore_e6
           for r in T.lm_stupid_backoff(train, test,
                                        "doc_id", "text").collect()}
    nn, v = 8, 5  # train tokens, train vocab
    assert got[10] == math.floor(1e6 * math.log(1 / 1) + 0.5)
    assert got[11] == math.floor(1e6 * math.log(0.4 * 2 / 2) + 0.5)
    assert got[12] == math.floor(
        1e6 * math.log(0.4 * 0.4 * 1 / (nn + v)) + 0.5)


# ------------------------------------------- edit-distance verify


def test_edit_distance_pairs_scores_and_cap(spark):
    """Three docs sharing a long run so winnowing pairs them all:
    a lightly-edited copy scores high sim with the exact edit count,
    while the cap turns a far pair into a dropped row (the −1
    fast-path) — the branch the driver corpus never fires."""
    from goka_spark.functions import dedup as D

    base = "the quick brown fox jumps over the lazy dog " * 4
    near = base.replace("lazy", "sleepy", 1)          # one word edit
    far = base + "x" * 300                            # >cap tail
    docs = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], "doc_id long, text string")

    got = {(r.id_a, r.id_b): r
           for r in D.edit_distance_pairs(
               docs, "doc_id", "text", max_dist=100).collect()}
    # base↔near: exact Levenshtein is 4 ('lazy'→'sleepy': 2 subs +
    # 2 inserts), sim close to 1e6
    r12 = got[(1, 2)]
    assert r12.edit_dist == 4
    mx = max(len(base), len(near))
    assert r12.sim_e6 == (mx - 4) * 1_000_000 // mx
    # the far doc shares fingerprints with both (common prefix run)
    # but its 300-char tail exceeds max_dist=100 → capped out
    assert (1, 3) not in got and (2, 3) not in got


def test_edit_distance_pairs_identical_docs(spark):
    """Exact copies: distance 0, sim exactly 1e6."""
    from goka_spark.functions import dedup as D

    t = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [(1, t), (2, t)], "doc_id long, text string")
    r = D.edit_distance_pairs(docs, "doc_id", "text").collect()[0]
    assert (r.id_a, r.id_b, r.edit_dist, r.sim_e6) == (1, 2, 0, 1_000_000)


# ------------------------------------------------- readability


def test_readability_fre_closed_form(spark):
    """Real sentences (the branch the synthetic corpus never fires):
    counts and both scores match the hand-computed closed form with
    truncating integer division."""
    txt = "the cat sat on the mat. it was flat!"
    docs = spark.createDataFrame([(1, txt)], "doc_id long, text string")
    r = T.readability_fre(docs, "doc_id", "text").collect()[0]
    # 9 words, 2 sentences, every word one vowel group -> 9 syllables
    assert (r.n_words, r.n_sentences, r.n_syllables) == (9, 2, 9)
    assert r.fre_e3 == 206835 - 1015 * 9 // 2 - 84600 * 9 // 9
    assert r.fkgl_e3 == 390 * 9 // 2 + 11800 * 9 // 9 - 15590


def test_readability_fre_vowelless_and_empty(spark):
    """Vowel-less words take the floor-of-1 syllable (the W − Wv
    term); the empty doc stays defined via the S, W floors."""
    docs = spark.createDataFrame([(1, "xyz qrs brr"), (2, "")],
                                 "doc_id long, text string")
    got = {r.doc_id: r for r in
           T.readability_fre(docs, "doc_id", "text").collect()}
    assert got[1].n_syllables == 3          # 0 groups + 3 floors
    assert got[2].n_words == 0 and got[2].fre_e3 == 206835


def test_readability_syllable_groups_not_letters(spark):
    """'beautiful' -> eau counts ONE group ('bEAUtifUl' = 3), the
    property separating the group heuristic from vowel-letter
    counting."""
    docs = spark.createDataFrame([(1, "beautiful")],
                                 "doc_id long, text string")
    r = T.readability_fre(docs, "doc_id", "text").collect()[0]
    assert r.n_syllables == 3


# --------------------------------------------- encoding audit


def test_encoding_anomalies_each_artifact_fires(spark, tmp_path, monkeypatch):
    """Planted artifacts (the clean driver corpus never fires any):
    replacement char, bell control, Latin-1 mojibake, NBSP, and one
    clean doc -> each counter 1, clean_e6 = 1/5."""
    import goka_spark.queries.llmdata as QL
    from goka_spark.queries.llmdata import encoding_anomalies

    rows = [(1, "s", "bad � here"),
            (2, "s", "binary \x07 leak"),
            (3, "s", "cafÃ© mojibake"),
            (4, "s", "html residue"),
            (5, "s", "perfectly clean")]
    docs = spark.createDataFrame(rows,
                                 "doc_id long, source string, text string")
    src = str(tmp_path / "documents.parquet")
    docs.write.parquet(src)
    monkeypatch.setattr(QL, "load",
                        lambda s, sf, *t: {"documents":
                                           s.read.parquet(src)})
    r = encoding_anomalies(spark, "ignored").collect()[0]
    assert (r.n_docs, r.n_replacement, r.n_control,
            r.n_mojibake, r.n_nbsp) == (5, 1, 1, 1, 1)
    assert r.clean_e6 == 1_000_000 // 5


def test_encoding_anomalies_tab_newline_not_control(spark, tmp_path,
                                                    monkeypatch):
    """Tabs/newlines/CR are legitimate text, NOT C0 artifacts — the
    class must exclude \\x09, \\x0A, \\x0D."""
    import goka_spark.queries.llmdata as QL
    from goka_spark.queries.llmdata import encoding_anomalies

    docs = spark.createDataFrame([(1, "s", "a\tb\nc\rd")],
                                 "doc_id long, source string, text string")
    src = str(tmp_path / "documents.parquet")
    docs.write.parquet(src)
    monkeypatch.setattr(QL, "load",
                        lambda s, sf, *t: {"documents":
                                           s.read.parquet(src)})
    r = encoding_anomalies(spark, "ignored").collect()[0]
    assert r.n_control == 0 and r.clean_e6 == 1_000_000


def test_template_prefix_clusters_short_docs_and_threshold(spark, tmp_path,
                                                           monkeypatch):
    """Docs shorter than the prefix length cluster on their full
    text; singletons are dropped; share is over ALL docs."""
    import goka_spark.queries.llmdata as QL
    from goka_spark.queries.llmdata import template_prefix_clusters

    rows = [(1, "404 not found page a"),
            (2, "404 not found page b"),
            (3, "404 not found elsewhere"),
            (4, "hi there"), (5, "hi there"),      # short: whole text
            (6, "unique opening words entirely")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    src = str(tmp_path / "documents.parquet")
    docs.write.parquet(src)
    monkeypatch.setattr(QL, "load",
                        lambda s, sf, *t: {"documents":
                                           s.read.parquet(src)})
    got = {r.prefix: r for r in
           template_prefix_clusters(spark, "ignored").collect()}
    assert got["404 not found"].n_docs == 3
    assert got["404 not found"].rep_doc_id == 1
    assert got["404 not found"].share_e6 == 3 * 1_000_000 // 6
    assert got["hi there"].n_docs == 2
    assert len(got) == 2                      # singleton dropped


def test_skipgram_pairs_window_and_symmetry(spark):
    """'neural X network' repeated: the (network, neural) pair is
    invisible to adjacent-only PMI but co-occurs at offset 2 here;
    counts are per occurrence, pair key is sorted, window caps at 4."""
    doc = "neural very network " * 6          # 18 words
    docs = spark.createDataFrame([(1, doc)], "doc_id long, text string")
    got = {(r.w1, r.w2): r.cnt_ab
           for r in T.skipgram_pmi_topk(
               docs, "doc_id", "text", min_count=1, k=100).collect()}
    # offsets for (neural, network): +2 within a block (6), network→
    # neural +1 across blocks (5), network→neural +4 (4) = 15
    assert got[("network", "neural")] == 15
    # 'very very' needs offset 3 between consecutive blocks: 5 times
    assert got[("very", "very")] == 5
    # same-word pairs at offset 3: the period of the template
    assert got[("neural", "neural")] == 5


def test_lsh_vs_edit_eval_confusion_wiring(spark, tmp_path, monkeypatch):
    """An exact copy is a tp at every theta; a prefix-sharing far
    doc is a labeled-universe pair with label 0 — precision/recall
    arithmetic pins the confusion wiring."""
    import goka_spark.queries.llmdata as QL
    from goka_spark.queries.llmdata import lsh_vs_edit_eval

    base = "the quick brown fox jumps over the lazy dog " * 4
    far = base + "completely different continuation " * 8
    docs = spark.createDataFrame(
        [(1, base), (2, base), (3, far)], "doc_id long, text string")
    src = str(tmp_path / "documents.parquet")
    docs.write.parquet(src)
    monkeypatch.setattr(QL, "load",
                        lambda s, sf, *t: {"documents":
                                           s.read.parquet(src)})
    got = {r.theta_e6: r for r in lsh_vs_edit_eval(spark, "x").collect()}
    for th, r in got.items():
        # pair (1,2): sim 1e6 -> labeled dup at every theta, and an
        # identical signature collides in every band -> tp
        assert r.tp >= 1
        assert r.precision_e6 == r.tp * 1_000_000 // max(r.n_pred, 1)
        assert r.recall_e6 == r.tp * 1_000_000 // max(r.n_label, 1)
        assert r.n_pairs == r.tp + r.fp + r.fn + (
            r.n_pairs - r.n_label - r.fp)


def test_pii_audit_phone_ip_classes(spark, tmp_path, monkeypatch):
    """Phone and IPv4 classes (never planted by the driver
    convention) fire on crafted docs; the word-boundary keeps a
    version string from counting as an IP."""
    import goka_spark.queries.llmdata as QL
    from goka_spark.queries.llmdata import pii_audit_matrix

    rows = [(1, "s", "call 555-867-5309 now"),
            (2, "s", "server at 192.168.1.77 down"),
            (3, "s", "nothing sensitive here")]
    docs = spark.createDataFrame(rows,
                                 "doc_id long, source string, text string")
    src = str(tmp_path / "documents.parquet")
    docs.write.parquet(src)
    monkeypatch.setattr(QL, "load",
                        lambda s, sf, *t: {"documents":
                                           s.read.parquet(src)})
    r = pii_audit_matrix(spark, "x").collect()[0]
    assert (r.n_phone, r.n_ip) == (1, 1)
    # doc 1,2 have pii; doc 3 clean BUT doc_id%10==0 planting never
    # applies (ids 1-3) -> any = 2/3
    assert r.any_pii_e6 == 2 * 1_000_000 // 3
