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
