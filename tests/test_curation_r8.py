"""Round-8 curation operators: doc_chunk, release_diff,
source_divergence_matrix, cluster_size_histogram, matryoshka_recall.
"""

import math

from pyspark.sql import functions as F

from goka_spark.functions import corpus as C
from goka_spark.functions import similarity as S
from goka_spark.functions import text as T


# ------------------------------------------------------- doc_chunk

def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_doc_chunk_covers_and_overlaps(spark):
    """Chunks tile the token sequence at stride intervals, overlap by
    chunk−stride tokens, and reconstruct the document exactly when
    de-overlapped."""
    words = [f"w{i}" for i in range(40)]
    df = _docs(spark, [(1, " ".join(words))])
    out = sorted(
        (r["chunk_idx"], r["n_tokens"], r["chunk_text"])
        for r in C.doc_chunk(df, "doc_id", "text",
                             chunk=16, stride=12).collect())
    # starts 0,12,24,36 → 4 chunks; last has 40-36=4 tokens
    assert [c[0] for c in out] == [0, 1, 2, 3]
    assert [c[1] for c in out] == [16, 16, 16, 4]
    for idx, n, text in out:
        assert text.split(" ") == words[idx * 12: idx * 12 + 16]
    # de-overlap: first `stride` tokens of each chunk + the tail
    rebuilt = []
    for idx, n, text in out:
        rebuilt.extend(text.split(" ")[:12])
    rebuilt.extend(out[-1][2].split(" ")[12:])
    assert rebuilt == words


def test_doc_chunk_short_and_empty_docs(spark):
    """A doc shorter than one chunk emits exactly one chunk; an empty
    doc emits none (the documented contract)."""
    df = _docs(spark, [(1, "a b c"), (2, ""), (3, "   ")])
    out = C.doc_chunk(df, "doc_id", "text", chunk=16, stride=12) \
        .collect()
    assert len(out) == 1
    r = out[0]
    assert (r["doc_id"], r["chunk_idx"], r["n_tokens"],
            r["chunk_text"]) == (1, 0, 3, "a b c")


# ----------------------------------------------------- release_diff

def test_release_diff_statuses(spark):
    old = _docs(spark, [(1, "same"), (2, "was this"), (3, "gone")])
    new = _docs(spark, [(1, "same"), (2, "now this"), (4, "fresh")])
    got = {r["doc_id"]: r["status"]
           for r in C.release_diff(old, new, "doc_id", "text").collect()}
    assert got == {1: "unchanged", 2: "changed", 3: "removed",
                   4: "added"}


# ------------------------------------- source_divergence_matrix

def test_js_divergence_identical_and_disjoint(spark):
    """Two sources with identical word distributions → JS 0; disjoint
    vocabularies → JS = ln 2 (both to within the 1-µnat rounding)."""
    rows = [
        (1, "a b c a", "s1"), (2, "a b c a", "s2"),       # identical
        (3, "x y z", "s3"), (4, "p q r", "s4"),           # disjoint
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, source string")
    got = {(r["source_a"], r["source_b"]): (r["shared_words"], r["js_e6"])
           for r in T.source_divergence_matrix(
               df, "doc_id", "text", "source").collect()}
    # every pair present: 4 sources → 6 rows
    assert len(got) == 6
    assert got[("s1", "s2")] == (3, 0)      # identical → JS 0
    ln2_e6 = int(round(1e6 * math.log(2)))
    shared, js = got[("s3", "s4")]
    assert shared == 0                       # fully disjoint
    assert abs(js - ln2_e6) <= 2             # → JS = ln 2


def test_js_divergence_partial_overlap_bounds(spark):
    """A half-overlapping pair lands strictly between 0 and ln 2 and
    is symmetric in the source order."""
    rows = [(1, "a a b b", "s1"), (2, "a a c c", "s2")]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, source string")
    out = T.source_divergence_matrix(df, "doc_id", "text",
                                     "source").collect()
    assert len(out) == 1
    r = out[0]
    assert (r["source_a"], r["source_b"]) == ("s1", "s2")
    assert r["shared_words"] == 1          # only 'a' shared
    ln2_e6 = int(round(1e6 * math.log(2)))
    assert 0 < r["js_e6"] < ln2_e6
    # exact value: p_a = q_a = 1/2 shared mass with equal weight →
    # term 0; tails are 1/2 each → js = ln2/2
    assert abs(r["js_e6"] - ln2_e6 // 2) <= 2


# ------------------------------------------------ matryoshka_recall

def test_matryoshka_prefix_determined_neighbors(spark):
    """Vectors whose ordering is fully decided by the first two
    coordinates: every prefix dim ≥ 2 must reach recall 1e6."""
    import random
    rnd = random.Random(7)
    rows = []
    for i in range(30):
        # dominant 2-d head, tiny tail noise
        head = [math.cos(i / 5.0), math.sin(i / 5.0)]
        tail = [rnd.uniform(-1e-4, 1e-4) for _ in range(6)]
        rows.append((i, [float(x) for x in head + tail]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["dim"]: r["recall_e6"]
           for r in S.matryoshka_recall(
               emb, "vec_id", "embedding", dims=(2, 4),
               k=3, n_queries=5).collect()}
    assert set(out) == {2, 4}
    assert out[4] == 1_000_000
    assert out[2] >= 900_000  # 1e-4 tail can flip a boundary tie


# ------------------------------------------- cluster_size_histogram

def test_cluster_size_histogram_sums_to_corpus(spark, sf_dir):
    from goka_spark.queries.llmdata import cluster_size_histogram
    from goka_spark.queries.base import load

    n_docs = load(spark, sf_dir, "documents")["documents"].count()
    hist = cluster_size_histogram(spark, sf_dir).collect()
    assert sum(r["n_docs"] for r in hist) == n_docs
    assert all(r["n_docs"] == r["cluster_size"] * r["n_clusters"]
               for r in hist)


# ------------------------------------------------ bigram_cond_entropy

def test_bigram_entropy_deterministic_vs_uniform(spark):
    """Fully predictable successors → H = 0; w1 that tells you
    nothing about w2 → H = ln(n_choices)."""
    rows = [
        # s1: 'a' is always followed by 'b', 'b' by 'a' → H = 0
        (1, "a b a b a b a b", "s1"),
        # s2: 'x' followed by p/q equally → H = ln 2
        (2, "x p x q x p x q x p x q x p x q", "s2"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, source string")
    from goka_spark.functions.text import bigram_cond_entropy

    got = {r["source"]: r for r in bigram_cond_entropy(
        df, "doc_id", "text", "source").collect()}
    assert got["s1"]["h_cond_e6"] == 0
    # s2 bigrams: (x,p)*4 (x,q)*4 (p,x)*4 (q,x)*3 — x's successors
    # split 4/4 → x contributes 8·ln2; p,q deterministic → 0.
    # H = 8·ln2 / 15
    import math
    want = int(8 * math.log(2) * 1e6) // 15
    assert abs(got["s2"]["h_cond_e6"] - want) <= 2


# ----------------------------------------------- embedding_dim_stats

def test_embedding_dim_stats_exact(spark):
    rows = [(1, [1.0, -2.0]), (2, [3.0, -4.0]), (3, [5.0, 0.0])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    from goka_spark.functions.similarity import embedding_dim_stats

    got = {r["dim"]: r for r in embedding_dim_stats(
        emb, "vec_id", "embedding").collect()}
    assert got[1]["n"] == 3 and got[1]["mean_e6"] == 3_000_000
    assert (got[1]["min_e6"], got[1]["max_e6"]) == (1_000_000, 5_000_000)
    assert got[1]["ssq_e12"] == (1 + 9 + 25) * 10**12
    # negative mean: sum = -6e6, n = 3 → -2e6 (truncating DIV)
    assert got[2]["mean_e6"] == -2_000_000
    assert got[2]["min_e6"] == -4_000_000 and got[2]["max_e6"] == 0


# ----------------------------------------------- chunk_pack_pipeline

def test_chunk_pack_covers_all_chunks_contiguously(spark, sf_dir):
    """Packed chunk placements tile the token stream: offsets are
    consistent with the running total and every chunk is placed."""
    from goka_spark.queries.llmdata import chunk_pack_pipeline

    out = sorted(
        ((r["doc_id"], r["chunk_idx"]), r["tok"], r["first_seq"],
         r["seq_offset"], r["n_seqs"])
        for r in chunk_pack_pipeline(spark, sf_dir).collect())
    cum = 0
    for (_id, tok, first, off, nseq) in out:
        assert first == cum // 128
        assert off == cum % 128
        assert nseq == (cum + tok - 1) // 128 - first + 1
        cum += tok


# ---------------------------------------------- jaccard_threshold_sweep

def test_threshold_sweep_monotone_and_complete(spark):
    """Counts are non-increasing in the threshold, every requested
    threshold reports a row (zero-pair thresholds report (0, 0)),
    and a planted near-dup pair survives exactly up to its true
    Jaccard."""
    from goka_spark.functions.dedup import jaccard_threshold_sweep

    base = " ".join(f"tok{i}" for i in range(30))
    rows = [(1, base), (2, base + " tail9"),   # near-identical pair
            (3, " ".join(f"other{i}" for i in range(30)))]
    df = _docs(spark, rows)
    out = {r["threshold_e6"]: (r["n_pairs"], r["n_docs"])
           for r in jaccard_threshold_sweep(
               df, "doc_id", "text",
               thresholds=(0.1, 0.5, 0.9, 0.999)).collect()}
    assert set(out) == {100000, 500000, 900000, 999000}
    pair_counts = [out[t][0] for t in sorted(out)]
    assert pair_counts == sorted(pair_counts, reverse=True)
    # docs 1,2 share 28 of 30 trigram starts → jaccard ≈ 0.93
    assert out[100000] == (1, 2)
    assert out[900000] == (1, 2)
    assert out[999000] == (0, 0)


# ---------------------------------------------- wav silence report

def test_wav_silence_planted_signal(spark):
    """A blob that is half silence (zeros) and half full-scale square
    wave: window accounting must be exact."""
    import struct

    from goka_spark.functions.multimodal import wav_silence_report

    # hand-built RIFF/WAVE PCM16 mono: 40 zero samples then 40
    # samples of ±20000
    samples = [0] * 40 + [20000 if i % 2 == 0 else -20000
                          for i in range(40)]
    data = b"".join(struct.pack("<h", s) for s in samples)
    hdr = (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
           + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000,
                                   16000, 2, 16)
           + b"data" + struct.pack("<I", len(data)))
    df = spark.createDataFrame([(1, hdr + data)],
                               "doc_id long, blob binary")
    r = wav_silence_report(df).collect()[0]
    assert (r["n_windows"], r["n_silent"]) == (4, 2)
    assert r["silent_e6"] == 500_000
    assert r["max_abs"] == 20000
