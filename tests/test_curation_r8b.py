"""Round-8b operators: chunk_dup_report, lang_id_eval,
quality_calibration, frame_dhash, cosine_threshold_sweep,
release_token_drift composition.
"""

from pyspark.sql import functions as F

from goka_spark.functions import corpus as C
from goka_spark.functions import multimodal as M
from goka_spark.functions import similarity as S


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ------------------------------------------------- chunk_dup_report

def test_chunk_dup_report_planted_boilerplate(spark):
    """Two docs sharing one exact 12-token chunk are both flagged at
    chunk granularity even though their full texts differ (the case
    doc-level exact dedup misses)."""
    boiler = " ".join(f"b{i}" for i in range(12))
    uniq_a = " ".join(f"a{i}" for i in range(12))
    uniq_b = " ".join(f"c{i}" for i in range(12))
    df = _docs(spark, [(1, boiler + " " + uniq_a),
                       (2, boiler + " " + uniq_b),
                       (3, " ".join(f"z{i}" for i in range(24)))])
    got = {r["doc_id"]: r for r in
           C.chunk_dup_report(df, "doc_id", "text", chunk=12).collect()}
    assert got[1]["n_chunks"] == 2 and got[1]["n_dup_chunks"] == 1
    assert got[1]["dup_e6"] == 500_000
    assert got[2]["n_dup_chunks"] == 1
    assert got[3]["n_dup_chunks"] == 0 and got[3]["dup_e6"] == 0


def test_chunk_dup_report_self_repeat_counts_instances(spark):
    """A doc repeating its own chunk counts BOTH instances as
    duplicated (instance semantics, not distinct-hash semantics)."""
    block = " ".join(f"w{i}" for i in range(12))
    df = _docs(spark, [(1, block + " " + block)])
    r = C.chunk_dup_report(df, "doc_id", "text", chunk=12).collect()[0]
    assert (r["n_chunks"], r["n_dup_chunks"], r["dup_e6"]) == \
        (2, 2, 1_000_000)


# ----------------------------------------------------- lang_id_eval

def test_lang_id_eval_metrics(spark, sf_dir):
    """Every labeled language gets a row; tp+fn sums to its labeled
    doc count; the ppm metrics follow the integer formulas including
    the zero-division → 0 path."""
    from goka_spark.queries.llmdata import lang_id_eval

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    labeled = {r["lang"]: r["n"] for r in
               docs.groupBy("lang").agg(F.count("*").alias("n"))
               .collect()}
    out = {r["lang"]: r for r in lang_id_eval(spark, sf_dir).collect()}
    assert set(out) == set(labeled)
    for lang, r in out.items():
        assert r["tp"] + r["fn"] == labeled[lang]
        exp_prec = (0 if r["tp"] + r["fp"] == 0
                    else r["tp"] * 1_000_000 // (r["tp"] + r["fp"]))
        exp_rec = (0 if r["tp"] + r["fn"] == 0
                   else r["tp"] * 1_000_000 // (r["tp"] + r["fn"]))
        exp_f1 = (0 if exp_prec + exp_rec == 0
                  else 2 * exp_prec * exp_rec // (exp_prec + exp_rec))
        assert (r["prec_e6"], r["rec_e6"], r["f1_e6"]) == \
            (exp_prec, exp_rec, exp_f1)


# ----------------------------------------------- quality_calibration

def test_quality_calibration_partitions_corpus(spark, sf_dir):
    from goka_spark.queries.llmdata import quality_calibration

    docs_n = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    out = quality_calibration(spark, sf_dir).collect()
    assert sum(r["n_docs"] for r in out) == docs_n
    for r in out:
        assert 0 <= r["bucket"] <= 9
        assert 0 <= r["n_pos"] <= r["n_docs"]
        assert r["pos_rate_e6"] == r["n_pos"] * 1_000_000 // r["n_docs"]


# ---------------------------------------------------- frame_dhash

def test_frame_dhash_matches_single_image_dhash(spark):
    """A one-frame stream's dHash equals image_dhash of the same
    quad image — the kernel is shared, not re-derived."""
    spec = spark.createDataFrame([(7, 1)], "doc_id long, nf int")
    stream = M.encode_ppm_stream_quad(spec, "doc_id", "nf",
                                      width=9, height=8, seed_mod=3)
    got = M.frame_dhash(stream).collect()[0]

    dims = spark.createDataFrame([(7, 9, 8, 7 % 3)],
                                 "doc_id long, w int, h int, seed int")
    single = M.image_dhash(
        M.encode_ppm_quad(dims, "doc_id", "w", "h", "seed")).collect()[0]
    assert got["dhash"] == single["dhash"]


def test_frame_dhash_finds_planted_static_scene(spark):
    """seed_mod=1 makes every frame identical — one distinct hash; the
    seed law (id+j)%3 over 5 frames yields exactly 3."""
    spec = spark.createDataFrame([(1, 5)], "doc_id long, nf int")
    static = M.encode_ppm_stream_quad(spec, "doc_id", "nf",
                                      width=9, height=8, seed_mod=1)
    hs = [r["dhash"] for r in M.frame_dhash(static).collect()]
    assert len(hs) == 5 and len(set(hs)) == 1

    varied = M.encode_ppm_stream_quad(spec, "doc_id", "nf",
                                      width=9, height=8, seed_mod=3)
    hv = [r["dhash"] for r in M.frame_dhash(varied).collect()]
    assert len(hv) == 5 and len(set(hv)) == 3


# ------------------------------------------- cosine_threshold_sweep

def test_cosine_threshold_sweep_monotone(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = sorted((r["threshold_e4"], r["n_pairs"], r["n_docs"])
                 for r in S.cosine_threshold_sweep(
                     emb, "vec_id", "embedding").collect())
    assert [t for t, _, _ in out] == [3000, 5000, 7000, 8000, 9000, 9500]
    pair_counts = [p for _, p, _ in out]
    assert pair_counts == sorted(pair_counts, reverse=True)
    # lowest threshold row == the raw LSH pair miner at 0.3
    base = S.cosine_near_pairs_lsh(emb, "vec_id", "embedding",
                                   threshold=0.3).count()
    assert out[0][1] == base
    for _, p, d in out:
        assert (p == 0) == (d == 0)
        if p > 0:
            assert d >= 2


# ---------------------------------------------- release_token_drift

def test_release_token_drift_identical_releases_zero(spark):
    """Old == new → one row with js exactly 0 and the full shared
    vocabulary; the tagged-union composition is exercised end to
    end."""
    from goka_spark.functions import text as T

    df = _docs(spark, [(1, "alpha beta gamma"), (2, "beta delta")])
    tagged = (df.select("doc_id", "text", F.lit("old").alias("rel"))
              .unionByName(
                  df.select("doc_id", "text", F.lit("new").alias("rel"))))
    out = T.source_divergence_matrix(tagged, "doc_id", "text",
                                     "rel").collect()
    assert len(out) == 1
    r = out[0]
    assert (r["source_a"], r["source_b"]) == ("new", "old")
    assert r["js_e6"] == 0 and r["shared_words"] == 4
