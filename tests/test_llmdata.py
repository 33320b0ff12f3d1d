"""Dedup / similarity / text / multimodal operator tests, incl.
planted near-duplicates (the synthetic corpus has none)."""

from pyspark.sql import functions as F

from goka_spark.functions import dedup as D
from goka_spark.functions import multimodal as M
from goka_spark.functions import similarity as S
from goka_spark.functions import text as T


BASE = ("the quick brown fox jumps over the lazy dog and then runs far away "
        "to the old stone house near the river bank where it sleeps")


def _docs(spark):
    near = BASE.replace("lazy", "sleepy")  # one-word edit → near-dup
    other = ("completely different content about spark query engines and "
             "distributed columnar storage with vectorized execution kernels "
             "plus adaptive shuffle planning for large clusters today")
    return spark.createDataFrame(
        [(1, BASE), (2, near), (3, other), (4, BASE)],
        "doc_id long, text string")


def test_exact_dedup_groups(spark):
    out = D.exact_dedup(_docs(spark), "doc_id", "text")
    rows = {r.keep_id: r.dup_cnt for r in out.collect()}
    assert rows[1] == 2  # docs 1 and 4 identical
    assert rows[2] == 1 and rows[3] == 1


def test_minhash_lsh_finds_planted_pair(spark):
    pairs = D.minhash_lsh_pairs(_docs(spark), "doc_id", "text",
                                num_perm=32, bands=16)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert (1, 2) in got  # near-dup caught
    assert (1, 4) in got  # exact dup caught
    assert (1, 3) not in got and (2, 3) not in got  # unrelated not caught


def test_simhash_deterministic_and_near(spark):
    s1 = {r.doc_id: r.simhash for r in
          D.simhash(_docs(spark), "doc_id", "text").collect()}
    s2 = {r.doc_id: r.simhash for r in
          D.simhash(_docs(spark), "doc_id", "text").collect()}
    assert s1 == s2
    assert s1[1] == s1[4]
    pairs = D.simhash_near_pairs(_docs(spark), "doc_id", "text",
                                 max_hamming=7, bands=8)
    got = {(r.id_a, r.id_b): r.hamming for r in pairs.collect()}
    assert got.get((1, 4)) == 0
    assert (1, 2) in got and got[(1, 2)] <= 7  # hamming 6, pigeonhole-caught


def test_ngram_jaccard_planted(spark):
    out = D.ngram_jaccard_pairs(_docs(spark), "doc_id", "text", threshold=0.3)
    got = {(r.id_a, r.id_b): r.jaccard for r in out.collect()}
    assert got[(1, 4)] == 1.0
    assert 0.3 < got[(1, 2)] < 1.0
    assert (1, 3) not in got


def test_cosine_topk_known_vectors(spark):
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 1.0]), (3, [-1.0, 0.0])],
        "vec_id long, embedding array<double>")
    out = S.cosine_topk(emb, emb.filter(F.col("vec_id") == 0),
                        "vec_id", "embedding", k=3)
    order = [r.neighbor_id for r in out.orderBy("rk").collect()]
    assert order == [1, 2, 3]


def test_lsh_ann_overlaps_bruteforce(spark, sf_dir):
    from goka_spark.queries.base import load

    emb = load(spark, sf_dir, "embeddings")["embeddings"]
    q = emb.filter(F.col("vec_id") < 5)
    exact = S.cosine_topk(emb, q, "vec_id", "embedding", k=5)
    approx = S.lsh_ann(emb, q, "vec_id", "embedding", k=5, bits=4)
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    assert len(a) > 0
    assert len(e & a) >= 5  # measured 7/25 with seed 42 (deterministic)


def test_cosine_topk_arrow_matches_exact(spark, sf_dir):
    from goka_spark.queries.base import load

    emb = load(spark, sf_dir, "embeddings")["embeddings"]
    q = emb.filter(F.col("vec_id") < 5)
    exact = S.cosine_topk(emb, q, "vec_id", "embedding", k=5)
    arrow = S.cosine_topk_arrow(emb, q, "vec_id", "embedding", k=5)
    e = {(r.query_id, r.neighbor_id, r.rk) for r in exact.collect()}
    a = {(r.query_id, r.neighbor_id, r.rk) for r in arrow.collect()}
    assert e == a


def test_text_functions(spark):
    df = spark.createDataFrame(
        [(1, "the cat is on the mat!"), (2, "")], "id long, text string")
    out = df.select(
        "id",
        T.ws_token_count(F.col("text")).alias("ws"),
        T.re_token_count(F.col("text")).alias("re"),
        T.lang_id(F.col("text")).alias("lang"),
        T.quality_score(F.col("text")).alias("q"),
    ).collect()
    r1 = [r for r in out if r.id == 1][0]
    assert r1.ws == 6 and r1.re == 7  # '!' is its own regex token
    assert r1.lang == "en"
    assert 0.0 <= r1.q <= 1.0
    r2 = [r for r in out if r.id == 2][0]
    assert r2.ws == 0


def test_fingerprint_shift_invariant(spark):
    df = spark.createDataFrame(
        [(1, "abcdefghijklmnop"), (2, "XYZabcdefghijklmnop")],
        "id long, text string")
    fps = {r.id: r.fp for r in
           df.select("id", T.fingerprint(F.col("text"), 8).alias("fp")).collect()}
    # doc2 = doc1 with a prefix; min-shingle fingerprint often survives
    # (content-defined); at minimum both are deterministic 32-hex strings
    assert all(len(v) == 32 for v in fps.values())


def test_multimodal_plumbing(spark):
    df = spark.createDataFrame([(1, "hello world"), (2, "x" * 100)],
                               "doc_id long, text string")
    meta = M.decode_image_meta(M.attach_blob(df), "doc_id", "blob")
    rows = {r.doc_id: r for r in meta.collect()}
    assert rows[1].n_bytes == 11 and rows[1].fmt == "stub"
    assert rows[2].width == (100 * 7) % 640
    frames = M.frame_sample_stub(M.attach_blob(df), "doc_id", "blob", every_n=2)
    assert frames.filter(F.col("doc_id") == 2).count() == 3  # 100//16=6 → 0,2,4


def test_cosine_near_pairs_lsh_subset_of_exact(spark, sf_dir):
    """LSH-banded near pairs: every reported pair is a TRUE pair
    (exact cosine verified inside buckets), recall > 0 on the tail."""
    from goka_spark.queries.base import load

    emb = load(spark, sf_dir, "embeddings")["embeddings"]
    exact = {(r.id_a, r.id_b): r.cos for r in S.cosine_near_pairs(
        emb, "vec_id", "embedding", threshold=0.3).collect()}
    lsh = {(r.id_a, r.id_b): r.cos for r in S.cosine_near_pairs_lsh(
        emb, "vec_id", "embedding", threshold=0.3).collect()}
    assert len(lsh) > 0
    assert set(lsh) <= set(exact)          # no false positives, ever
    assert all(exact[p] == lsh[p] for p in lsh)  # same exact cosines


def test_cosine_near_pairs_lsh_no_cross_join(spark, sf_dir):
    from goka_spark.plans import explain as X
    from goka_spark.queries import llmdata

    plan = X.simple(llmdata.dedup_embedding_cosine(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_cosine_topk_arrow_query_cap(spark, sf_dir):
    import pytest
    from goka_spark.queries.base import load

    emb = load(spark, sf_dir, "embeddings")["embeddings"]
    with pytest.raises(ValueError, match="query rows"):
        S.cosine_topk_arrow(emb, emb, "vec_id", "embedding",
                            k=5, max_queries=10)


def test_ngram_max_df_prunes_candidates_not_similarity(spark):
    """A stop-shingle present in EVERY doc may not generate candidate
    pairs, but surviving pairs still get exact full-set Jaccard."""
    stop = "x y z"  # 3-gram planted into all docs
    docs = _docs(spark).withColumn(
        "text", F.concat(F.col("text"), F.lit(" " + stop)))
    unpruned = {(r.id_a, r.id_b): r.jaccard for r in D.ngram_jaccard_pairs(
        docs, "doc_id", "text", threshold=0.01).collect()}
    pruned = {(r.id_a, r.id_b): r.jaccard for r in D.ngram_jaccard_pairs(
        docs, "doc_id", "text", threshold=0.01, max_df=3).collect()}
    # (1,3): only shared shingles involve the planted suffix → dropped
    assert (1, 3) in unpruned and (1, 3) not in pruned
    # (1,4) exact dups: candidate survives, jaccard still full-set 1.0
    assert pruned[(1, 4)] == 1.0 == unpruned[(1, 4)]
    assert pruned[(1, 2)] == unpruned[(1, 2)]  # value never changes


def test_ivf_topk_recall_vs_exact(spark, sf_dir):
    """IVF ANN: every reported neighbor carries its TRUE cosine, and
    probing 4/16 cells recovers most of the exact top-5."""
    from goka_spark.queries.base import load

    emb = load(spark, sf_dir, "embeddings")["embeddings"]
    queries = emb.filter(F.col("vec_id") < 10)
    exact = S.cosine_topk(emb, queries, "vec_id", "embedding", k=5)
    exact_pairs = {(r.query_id, r.neighbor_id): r.cos
                   for r in exact.collect()}
    ivf = S.ivf_topk(emb, queries, "vec_id", "embedding",
                     k=5, n_cells=16, n_probe=4)
    got = {(r.query_id, r.neighbor_id): r.cos for r in ivf.collect()}
    assert len(got) == 50  # 10 queries x k
    hits = set(got) & set(exact_pairs)
    assert len(hits) / len(exact_pairs) >= 0.5  # recall floor at 4/16
    assert all(exact_pairs[p] == got[p] for p in hits)  # true cosines


def test_ivf_join_is_cell_equijoin(spark, sf_dir):
    """The IVF plan joins on the cell id with the query side broadcast
    — never a cartesian product over the corpus."""
    from goka_spark.plans import explain as X
    from goka_spark.queries import llmdata as L

    plan = X.simple(L.embedding_ivf_ann(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_connected_components_merges_chains(spark):
    """Pairs (1,2),(2,3) and (7,8): min-label propagation finds
    {1,2,3}->1 and {7,8}->7 — transitive merge, not just pair groups."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8)], "id_a long, id_b long")
    got = {(r.node, r.cluster_id)
           for r in D.connected_components(pairs).collect()}
    assert got == {(1, 1), (2, 1), (3, 1), (7, 7), (8, 7)}


def test_connected_components_long_chain_converges(spark):
    """A 12-node path graph needs several propagation rounds — the
    loop must iterate to the true fixpoint, not stop after one."""
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(11)], "id_a long, id_b long")
    got = {r.cluster_id for r in D.connected_components(pairs).collect()}
    assert got == {0}


def test_repetition_ratio_flags_looped_text(spark):
    df = spark.createDataFrame(
        [(1, "a b c a b c a b c a b c"),      # heavy 3-gram repeats
         (2, "one two three four five six")],  # all distinct
        "doc_id long, text string")
    got = {r.doc_id: r.rep for r in df.select(
        "doc_id", T.repetition_ratio(F.col("text"), 3).alias("rep")
    ).collect()}
    assert got[2] == 0.0
    assert got[1] > 0.5  # 10 grams, only 3 distinct


def test_corpus_filter_verdict_priority(spark):
    """One doc per drop stage, crafted so each fails exactly its own
    gate: verdict must be the FIRST failing stage, dup keepers must be
    the min doc_id, and clean docs come back 'kept'."""
    from goka_spark.queries.llmdata import filter_verdicts
    good = " ".join(f"the word{i} and item{i} of thing{i}" for i in range(12))
    near_a = " ".join(f"a pig{i} is in pen{i} to eat{i}" for i in range(12))
    near_b = near_a.replace("pig3", "cow3")  # one shingle differs
    rows = [
        (1, "der die das und zu ist ein nicht der die das und"),  # lang
        (2, "!!! ??? ### $$$ %%%"),                               # quality
        (3, "the cat sat on the mat " * 16),                      # repetition
        (4, good), (5, good),                                     # exact pair
        (6, near_a), (7, near_b),                                 # near pair
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.verdict for r in filter_verdicts(docs).collect()}
    assert got == {1: "lang", 2: "quality", 3: "repetition",
                   4: "kept", 5: "exact_dup", 6: "kept", 7: "near_dup"}


def test_resize_stub_exact_payload_size(spark):
    df = spark.createDataFrame([(1, "ab"), (2, "x" * 9000)],
                               "doc_id long, text string")
    out = M.resize_image_stub(M.attach_blob(df), width=8, height=8).collect()
    assert all(len(r.blob) == 64 for r in out)
    assert {(r.width, r.height) for r in out} == {(8, 8)}


def test_image_features_byte_histogram(spark):
    """All-'a' payload → all mass in bin ord('a')//16 = 6; features
    sum to 1 for non-empty blobs."""
    df = spark.createDataFrame([(1, "aaaa"), (2, "")],
                               "doc_id long, text string")
    got = {r.doc_id: r.features
           for r in M.image_features(M.attach_blob(df)).collect()}
    assert got[1][6] == 1.0 and sum(got[1]) == 1.0
    assert sum(got[2]) == 0.0


def test_decontaminate_flags_ngram_overlap(spark):
    """Corpus doc sharing a 3-gram with the benchmark is flagged with
    the exact distinct-shingle hit count; unrelated docs are not."""
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta")], "doc_id long, text string")
    corpus = spark.createDataFrame(
        [(1, "prefix alpha beta gamma suffix"),   # shares 1 shingle
         (2, "totally unrelated words here")],
        "doc_id long, text string")
    got = {r.doc_id: r.n_hits for r in D.decontaminate(
        corpus, bench, "doc_id", "text", n=3).collect()}
    assert got == {1: 1}


def test_decontaminate_min_hits_threshold(spark):
    """min_hits=2 drops single-shingle overlaps."""
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon")], "doc_id long, text string")
    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma delta zzz"),   # 2 shared shingles
         (2, "alpha beta gamma zzz yyy")],    # 1 shared shingle
        "doc_id long, text string")
    got = {r.doc_id: r.n_hits for r in D.decontaminate(
        corpus, bench, "doc_id", "text", n=3, min_hits=2).collect()}
    assert got == {1: 2}


def test_shard_pack_matches_global_prefix(spark):
    """Two-pass distributed prefix sum must equal the single-window
    definition: with 10-token docs and budget 25 the shard boundary
    falls mid-doc and the doc belongs to the shard its PREFIX starts
    in. Internal range partitioning leaves most partitions empty at
    this size — the offset chain must skip them correctly."""
    df = spark.createDataFrame([(i, 10) for i in range(10)],
                               "doc_id long, tok long")
    got = {r.doc_id: r.shard_id
           for r in T.shard_pack(df, "doc_id", "tok", 25).collect()}
    assert got == {i: (i * 10) // 25 for i in range(10)}


def test_pq_topk_recall_on_clustered_vectors(spark):
    """PQ/ADC ANN: on well-separated clusters the compressed-code scan
    + exact re-rank recovers nearly all true neighbors, and the
    reported cosines are the TRUE cosines (re-rank is exact)."""
    import numpy as np

    rng = np.random.default_rng(7)
    centers = rng.standard_normal((10, 64)) * 5
    rows = []
    for i in range(200):
        v = centers[i % 10] + rng.standard_normal(64) * 0.1
        rows.append((i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = df.filter(F.col("vec_id") < 10)
    exact = S.cosine_topk(df, queries, "vec_id", "embedding", k=5)
    exact_pairs = {(r.query_id, r.neighbor_id): r.cos for r in exact.collect()}
    pq = S.pq_topk(df, queries, "vec_id", "embedding",
                   k=5, m=8, ksub=16, refine=4)
    got = {(r.query_id, r.neighbor_id): r.cos for r in pq.collect()}
    assert len(got) == 50
    hits = set(got) & set(exact_pairs)
    assert len(hits) / len(exact_pairs) >= 0.8
    assert all(exact_pairs[p] == got[p] for p in hits)


def test_pq_encode_shapes_and_determinism(spark, sf_dir):
    """Codes are m small ints (the 32x memory story) and the whole
    pipeline is seed-deterministic across runs."""
    from goka_spark.queries.base import load

    emb = load(spark, sf_dir, "embeddings")["embeddings"]
    books = S.pq_codebooks(emb, "embedding", m=8, ksub=16)
    assert books.shape == (8, 16, 8)
    codes = S.pq_encode(emb, "vec_id", "embedding", books).collect()
    assert all(len(r.codes) == 8 for r in codes)
    assert all(0 <= c < 16 for r in codes for c in r.codes)
    books2 = S.pq_codebooks(emb, "embedding", m=8, ksub=16)
    assert (books == books2).all()


def test_dup_ngram_coverage_planted(spark):
    """Two docs sharing a 5-gram get full coverage on it; a unique doc
    scores zero."""
    df = spark.createDataFrame(
        [(1, "a b c d e unique tail one"),
         (2, "a b c d e other suffix two"),
         (3, "totally different words here now")],
        ["doc_id", "text"])
    out = {r.doc_id: r for r in
           D.dup_ngram_coverage(df, "doc_id", "text", n=5).collect()}
    # docs 1/2 share exactly the 'a b c d e' 5-gram
    assert out[1].dup_grams == 1 and out[2].dup_grams == 1
    assert out[3].dup_grams == 0 and out[3].dup_frac == 0.0
    assert out[1].n_grams == 4  # 8 words -> 4 5-grams
    assert abs(out[1].dup_frac - 0.25) < 1e-9


def test_gopher_rules_split(spark):
    """Gopher flags discriminate: a normal english doc keeps, a
    too-short doc and a stopword-free symbol doc drop."""
    from goka_spark.functions.text import gopher_rules

    good = "the quick brown fox jumps over the lazy dog and it is fine " * 4
    df = spark.createDataFrame(
        [(1, good), (2, "too short"), (3, "@@ ## $$ %% ^^ && ** (( )) !! " * 5)],
        ["doc_id", "text"])
    r = gopher_rules(F.col("text"))
    out = {x.doc_id: x for x in
           df.select("doc_id", *[c.alias(k) for k, c in r.items()]).collect()}
    assert out[1].keep == 1
    assert out[2].keep == 0          # word count below floor
    assert out[3].keep == 0          # no alpha words, no stopwords
    assert out[3].alpha_ratio == 0.0
    assert out[1].sw_hits >= 2


def test_tfidf_rare_term_outranks_common(spark):
    """A term unique to one doc outscores corpus-wide terms there."""
    from goka_spark.functions.text import tfidf_topk

    df = spark.createDataFrame(
        [(1, "common words everywhere plus zebra zebra"),
         (2, "common words everywhere plus filler filler"),
         (3, "common words everywhere plus noise noise")],
        ["doc_id", "text"])
    top = tfidf_topk(df, "doc_id", "text", k=2)
    best = {r.doc_id: r.term for r in top.filter(F.col("rk") == 1).collect()}
    assert best == {1: "zebra", 2: "filler", 3: "noise"}


def test_ivf_pq_topk_recall_on_clustered_vectors(spark):
    """IVF-PQ composition: cell pruning + compressed scan + exact
    re-rank still recovers most true neighbors on separable clusters,
    and reported cosines are exact."""
    import numpy as np

    rng = np.random.default_rng(11)
    centers = rng.standard_normal((8, 64)) * 5
    rows = [(i, [float(x) for x in centers[i % 8] + rng.standard_normal(64) * 0.1])
            for i in range(200)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = df.filter(F.col("vec_id") < 8)
    exact = S.cosine_topk(df, queries, "vec_id", "embedding", k=5)
    exact_pairs = {(r.query_id, r.neighbor_id): r.cos for r in exact.collect()}
    got = {(r.query_id, r.neighbor_id): r.cos for r in
           S.ivf_pq_topk(df, queries, "vec_id", "embedding",
                         k=5, n_cells=8, n_probe=2, m=8, refine=4).collect()}
    hits = set(got) & set(exact_pairs)
    assert len(hits) / len(exact_pairs) >= 0.8
    assert all(exact_pairs[p] == got[p] for p in hits)


def test_ppm_codec_roundtrip_and_parse():
    """REAL codec: encode a known P6 image, parse it back byte-exact;
    malformed input fails loudly (a stub can't do either)."""
    import numpy as np
    import pytest

    blob = M.ppm_encode_gray(4, 3, seed=5)
    w, h, maxval, pix = M.ppm_parse(blob)
    assert (w, h, maxval) == (4, 3, 255)
    expect = (5 * 31 + np.arange(12)) % 256
    assert (pix[:, :, 0].ravel() == expect).all()
    assert (pix[:, :, 1] == pix[:, :, 0]).all()  # gray: channels equal
    # comment + whitespace handling in the header
    commented = b"P6\n# a comment\n4 3\n255\n" + blob.split(b"255\n", 1)[1]
    assert M.ppm_parse(commented)[:2] == (4, 3)
    with pytest.raises(ValueError, match="not a P6"):
        M.ppm_parse(b"P5\n1 1\n255\n\x00")
    with pytest.raises(ValueError, match="short pixel"):
        M.ppm_parse(b"P6\n4 3\n255\n\x00\x01")


def test_ppm_resize_nearest_neighbor(spark):
    """Resize is REAL pixel work: downscale 4x4→2x2 picks the exact
    nearest-neighbor source pixels."""
    import numpy as np

    blob = M.ppm_encode_gray(4, 4, seed=0)
    df = spark.createDataFrame([(1, bytearray(blob))], "doc_id long, blob binary")
    out = M.resize_ppm(df, 2, 2).collect()[0]
    w, h, _, pix = M.ppm_parse(bytes(out.blob))
    assert (w, h) == (2, 2)
    _, _, _, src = M.ppm_parse(blob)
    # ys = xs = [0, 2] → corners of the even grid
    assert (pix == src[[0, 2]][:, [0, 2]]).all()


def test_ppm_decode_meta_distributed(spark):
    """The decode runs per Arrow batch on executors and returns true
    pixel statistics."""
    import numpy as np

    dims = spark.createDataFrame(
        [(i, 4 + i % 3, 3 + i % 2, i) for i in range(10)],
        "doc_id long, w int, h int, seed long")
    meta = {r.doc_id: r for r in
            M.decode_ppm_meta(M.encode_ppm(dims, "doc_id", "w", "h", "seed"))
            .collect()}
    for i in range(10):
        w, h = 4 + i % 3, 3 + i % 2
        assert (meta[i].width, meta[i].height) == (w, h)
        expect = float(np.mean((i * 31 + np.arange(w * h)) % 256))
        assert meta[i].mean_r == round(expect, 4)  # decoder rounds to 4


def test_wav_codec_roundtrip_and_chunk_walk():
    """REAL audio codec: encode PCM16, parse back sample-exact; the
    chunk walker skips unknown chunks; malformed input fails loudly."""
    import struct

    import numpy as np
    import pytest

    blob = M.wav_encode_pcm16(50, 8000, seed=3)
    n_ch, rate, bits, samples = M.wav_parse(blob)
    assert (n_ch, rate, bits, len(samples)) == (1, 8000, 16, 50)
    expect = ((3 * 7 + np.arange(50) * 13) % 65536) - 32768
    assert (samples == expect).all()
    # insert a LIST chunk between fmt and data: parser must skip it
    fmt_end = 12 + 8 + 16
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    padded = blob[:fmt_end] + extra + blob[fmt_end:]
    assert (M.wav_parse(padded)[3] == expect).all()
    with pytest.raises(ValueError, match="RIFF"):
        M.wav_parse(b"nope")


def test_ppm_stream_frame_sample(spark):
    """REAL frame stream: N concatenated P6 frames parse back
    individually; sampling keeps even frames with true pixel means."""
    import numpy as np

    spec = spark.createDataFrame([(7, 4)], "doc_id long, nf int")
    blobs = M.encode_ppm_stream(spec, "doc_id", "nf", width=4, height=3)
    out = {r.frame_idx: r for r in M.frame_sample(blobs, every_n=2).collect()}
    assert set(out) == {0, 2}
    for j in (0, 2):
        expect = float(np.mean(((7 * 100 + j) * 31 + np.arange(12)) % 256))
        assert out[j].mean_r == round(expect, 4)
        assert (out[j].width, out[j].height) == (4, 3)


def test_auto_max_df_equals_explicit_cutoff(spark, sf_dir):
    """max_df='auto' is exactly max_df=c for the c the policy picks —
    the auto path adds tuning, never different semantics."""
    from goka_spark.queries.base import load

    docs = load(spark, sf_dir, "documents")["documents"]
    sh = (D.shingle_postings(D._fan_out(docs), "doc_id", "text", 3,
                             distinct=False)
          .repartition("sh").dropDuplicates(["doc", "sh"]))
    c = D.auto_max_df(sh)
    assert c >= 1
    auto = {(r.id_a, r.id_b): r.jaccard for r in D.ngram_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.05,
        max_df="auto").collect()}
    explicit = {(r.id_a, r.id_b): r.jaccard for r in D.ngram_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.05,
        max_df=c).collect()}
    assert auto == explicit and len(auto) > 0


def test_auto_max_df_respects_work_budget(spark, sf_dir):
    """The chosen cutoff's candidate-join work sum(df^2·n) stays
    within budget×postings, and c+1 would exceed it (maximality) —
    the linear-scale guarantee is structural, not empirical."""
    from goka_spark.queries.base import load

    docs = load(spark, sf_dir, "documents")["documents"]
    sh = (D.shingle_postings(D._fan_out(docs), "doc_id", "text", 3,
                             distinct=False)
          .repartition("sh").dropDuplicates(["doc", "sh"]))
    budget = 4
    c = D.auto_max_df(sh, budget=budget)
    hist = {r._df: r._n for r in
            sh.groupBy("sh").agg(F.count("*").alias("_df"))
            .groupBy("_df").agg(F.count("*").alias("_n")).collect()}
    total = sum(d * n for d, n in hist.items())
    work = lambda cut: sum(d * d * n for d, n in hist.items() if d <= cut)
    assert work(c) <= budget * total
    if any(d > c for d in hist):
        nxt = min(d for d in hist if d > c)
        assert work(nxt) > budget * total


def test_dup_span_extract_merges_overlaps(spark):
    """Two docs sharing a 7-word run: 5-gram hits at positions 1..3
    merge into ONE span [1, 7]; unique text yields no span."""
    shared = "w1 w2 w3 w4 w5 w6 w7"
    docs = spark.createDataFrame(
        [(1, shared + " unique tail one alpha beta"),
         (2, shared + " other ending here gamma delta"),
         (3, "completely different words with no overlap at all")],
        "doc_id long, text string")
    spans = {(r.doc_id, r.span_start, r.span_end, r.dup_grams)
             for r in D.dup_span_extract(docs, "doc_id", "text",
                                         n=5, min_df=2).collect()}
    assert (1, 1, 7, 3) in spans and (2, 1, 7, 3) in spans
    assert not any(d == 3 for d, *_ in spans)


def test_dup_span_extract_separates_gapped_spans(spark):
    """Duplicated runs separated by unique words become SEPARATE
    spans, not one merged blob."""
    run_a = "a1 a2 a3 a4 a5"
    run_b = "b1 b2 b3 b4 b5"
    docs = spark.createDataFrame(
        [(1, f"{run_a} uniq1x uniq2x uniq3x {run_b}"),
         (2, f"{run_a} other3 filler4 words5 {run_b}")],
        "doc_id long, text string")
    spans = sorted(
        (r.span_start, r.span_end) for r in
        D.dup_span_extract(docs, "doc_id", "text", n=5, min_df=2)
        .filter(F.col("doc_id") == 1).collect())
    assert spans == [(1, 5), (9, 13)]


def test_dsir_importance_ranks_target_like_docs(spark):
    """Docs made of target-model vocabulary score higher than docs of
    out-of-target vocabulary — the importance-resampling contract."""
    target_text = "alpha beta gamma delta epsilon zeta eta theta"
    other_text = "one two three four five six seven eight"
    corpus = spark.createDataFrame(
        [(0, target_text), (7, target_text),        # target slice
         (1, target_text), (2, other_text)],
        "doc_id long, text string")
    target = corpus.filter(F.col("doc_id") % 7 == 0)
    got = {r.doc_id: r.weight for r in T.dsir_importance(
        corpus, target, "doc_id", "text", n_buckets=256).collect()}
    assert got[1] > got[2]  # target-vocab doc outranks other-vocab doc
    # weight_e6 integerization: weight is exactly weight_e6 / 1e6
    rows = T.dsir_importance(corpus, target, "doc_id", "text",
                              n_buckets=256).collect()
    assert all(abs(r.weight - r.weight_e6 / 1e6) == 0 for r in rows)


def test_line_dedup_removes_boilerplate_lines(spark):
    """A line repeated across >= min_df docs disappears from every doc;
    unique lines and order survive; empty lines are structural."""
    boiler = "subscribe to our newsletter"
    docs = spark.createDataFrame(
        [(1, f"unique alpha one\n{boiler}\nkeep me please"),
         (2, f"{boiler}\ndifferent beta two"),
         (3, "totally original\n\nwith an empty line")],
        "doc_id long, text string")
    got = {r.doc_id: r for r in T.line_dedup_filter(
        docs, "doc_id", "text", min_df=2).collect()}
    assert got[1].clean_text == "unique alpha one\nkeep me please"
    assert got[1].lines_removed == 1 and got[1].lines_total == 3
    assert got[2].clean_text == "different beta two"
    assert got[3].clean_text == "totally original\n\nwith an empty line"
    assert got[3].lines_removed == 0


def test_line_dedup_doc_reduced_to_empty(spark):
    """A doc made entirely of corpus-wide boilerplate ends up with an
    empty clean_text, not a missing row."""
    docs = spark.createDataFrame(
        [(1, "b1\nb2"), (2, "b1\nb2"), (3, "b1\nb2")],
        "doc_id long, text string")
    got = {r.doc_id: r for r in T.line_dedup_filter(
        docs, "doc_id", "text", min_df=2).collect()}
    assert set(got) == {1, 2, 3}
    assert all(r.clean_text == "" and r.lines_removed == 2
               for r in got.values())


def test_lm_logprob_prefers_common_transitions(spark):
    """A doc built from the corpus's dominant bigram pattern scores a
    higher mean log-prob than one of never-repeated transitions."""
    common = "the cat sat on the mat"
    docs = spark.createDataFrame(
        [(1, common), (2, common), (3, common),
         (4, "zeppelin quartz vortex jackdaw nymph")],
        "doc_id long, text string")
    got = {r.doc_id: r for r in T.lm_logprob(
        docs, "doc_id", "text").collect()}
    assert got[1].avg_logprob == got[2].avg_logprob == got[3].avg_logprob
    assert got[1].avg_logprob > got[4].avg_logprob
    # integerization invariant: avg = logprob_e6 / 1e6 / n exactly
    for r in got.values():
        assert r.avg_logprob == r.logprob_e6 / 1e6 / r.n_bigrams


def test_lm_logprob_short_doc_is_null(spark):
    """Docs with <2 words carry no bigrams: n=0, avg NULL — never a
    divide-by-zero or a fabricated score."""
    docs = spark.createDataFrame(
        [(1, "single"), (2, ""), (3, "two words")],
        "doc_id long, text string")
    got = {r.doc_id: r for r in T.lm_logprob(
        docs, "doc_id", "text").collect()}
    assert got[1].n_bigrams == 0 and got[1].avg_logprob is None
    assert got[2].n_bigrams == 0 and got[2].avg_logprob is None
    assert got[3].n_bigrams == 1 and got[3].avg_logprob is not None


def test_gram_oracles_handle_empty_docs(spark):
    """The gram CTEs in the dup_span_extract / corpus_importance_weights
    oracles must emit NO grams for empty or whitespace-only documents
    (DuckDB's range(1, greatest(len-k,1)+1) otherwise yields one
    empty-string gram that Spark never produces).  Latent on the
    driver's testdata (no empty docs there) — pinned here on a corpus
    that has them."""
    import duckdb
    import pandas as pd

    from goka_spark.queries import all_oracles

    dup = "omega phi chi psi rho sigma tau upsilon"
    corpus = [(0, ""), (1, "   "), (2, dup), (3, dup),
              (7, "lone words here only once spoken today friend"),
              (14, dup + " trailing extras beyond the shared run")]
    docs = spark.createDataFrame(corpus, "doc_id long, text string")
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(
        corpus, columns=["doc_id", "text"]))
    oracles = all_oracles()

    for name, sdf in [
        ("dup_span_extract",
         D.dup_span_extract(docs, "doc_id", "text", n=5, min_df=2)),
        ("corpus_importance_weights",
         T.dsir_importance(docs, docs.filter(F.col("doc_id") % 7 == 0),
                           "doc_id", "text", n_buckets=1024)),
        ("doc_lm_score", T.lm_logprob(docs, "doc_id", "text")),
    ]:
        s = sdf.toPandas()
        o = con.sql(oracles[name]).df()
        s = s.reindex(sorted(s.columns), axis=1) \
            .sort_values(sorted(s.columns)).reset_index(drop=True)
        o = o.reindex(sorted(o.columns), axis=1) \
            .sort_values(sorted(o.columns)).reset_index(drop=True)
        assert len(s) == len(o), f"{name}: {len(s)} vs {len(o)} rows"
        for c in s.columns:
            if s[c].dtype == "float64":
                s[c], o[c] = s[c].round(6), o[c].round(6)
        pd.testing.assert_frame_equal(
            s, o.astype(s.dtypes.to_dict()), check_dtype=False)


def test_image_dhash_scale_invariant(spark):
    """dHash of an image == dHash of its 2x nearest-neighbor upscale
    (floor-division index maps compose: (i*2w//9)//2 == i*w//9) — the
    perceptual-hash property that makes it a near-dup fingerprint."""
    dims = spark.createDataFrame(
        [(1, 6, 5, 7), (2, 9, 4, 11)], ["doc_id", "w", "h", "seed"])
    blobs = M.encode_ppm(dims, "doc_id", "w", "h", "seed")
    orig = {r["doc_id"]: r["dhash"]
            for r in M.image_dhash(blobs).collect()}
    # resize each to 2x its own dims: per-size frames
    for (i, w, h, s) in [(1, 6, 5, 7), (2, 9, 4, 11)]:
        one = spark.createDataFrame([(i, w, h, s)],
                                    ["doc_id", "w", "h", "seed"])
        b1 = M.encode_ppm(one, "doc_id", "w", "h", "seed")
        b2 = M.resize_ppm(b1, 2 * w, 2 * h)
        h2 = M.image_dhash(b2).first()["dhash"]
        assert h2 == orig[i], i


def test_image_dhash_separates_content(spark):
    """Different seeds give different hashes (planted dup groups in
    the registry query rely on hash equality <=> same content)."""
    dims = spark.createDataFrame(
        [(i, 8, 6, i) for i in range(20)], ["doc_id", "w", "h", "seed"])
    hs = [r["dhash"] for r in
          M.image_dhash(M.encode_ppm_quad(
              dims, "doc_id", "w", "h", "seed")).collect()]
    assert len(set(hs)) >= 18  # near-unique across contents
    # and the linear RAMP law is exactly why quad exists: all ramps
    # share gradient signs, collapsing to almost one hash
    ramps = [r["dhash"] for r in
             M.image_dhash(M.encode_ppm(
                 dims, "doc_id", "w", "h", "seed")).collect()]
    assert len(set(ramps)) <= 3


def test_pack_sequences_reference(spark):
    """r7 concat-and-chunk packing vs a pure-Python reference: spans,
    offsets and boundary crossings all exact; zero-token docs drop."""
    toks = [(0, 100), (1, 2000), (2, 48), (3, 0), (4, 5000), (5, 1)]
    df = spark.createDataFrame(toks, "doc_id long, tok long")
    got = {r.doc_id: (r.first_seq, r.last_seq, r.seq_offset, r.n_seqs)
           for r in T.pack_sequences(df, "doc_id", "tok", 2048).collect()}
    cum, want = 0, {}
    for d, t in toks:
        if t >= 1:
            first, last = cum // 2048, (cum + t - 1) // 2048
            want[d] = (first, last, cum % 2048, last - first + 1)
        cum += t
    assert got == want
    # doc 4 (5000 tokens starting at 2148) spans 3 sequences
    assert got[4][3] == 3
    assert 3 not in got  # zero-token doc occupies no stream position


def test_ngram_novelty_first_copy_wins(spark):
    """The earliest doc scores 1.0; an exact later duplicate scores
    0; a half-overlapping doc scores its fresh fraction."""
    corpus = spark.createDataFrame(
        [(1, "a b c d e"),        # all 3 shingles first seen here
         (2, "a b c d e"),        # exact dup — zero novel
         (3, "a b c x y z")],     # shares 'a b c'; 3 of 4 novel
        "doc_id long, text string")
    got = {r.doc_id: (r.n_grams, r.novel, r.novelty_e6)
           for r in D.ngram_novelty(corpus, "doc_id", "text", 3).collect()}
    assert got[1] == (3, 3, 1_000_000)
    assert got[2] == (3, 0, 0)
    assert got[3] == (4, 3, 750_000)


def test_hard_negative_topk_excludes_same_label(spark):
    """r7 contrastive mining: neighbors always carry a different
    label than the anchor, ranking is by true cosine, and the
    same-class nearest vector (cos≈1) never appears."""
    rows = [
        (0, [1.0, 0.0], 0),   # anchor
        (1, [0.99, 0.14], 0),  # same class, most similar — excluded
        (2, [0.9, 0.44], 1),   # hard negative (closest other-class)
        (3, [0.0, 1.0], 1),
        (4, [-1.0, 0.0], 2),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int")
    out = S.hard_negative_topk(
        emb, emb.filter(F.col("vec_id") == 0),
        "vec_id", "embedding", "label", k=2).collect()
    assert [r.neighbor_id for r in out] == [2, 3]
    assert all(r.query_label == 0 and r.neighbor_label != 0 for r in out)
    assert out[0].cos > out[1].cos
