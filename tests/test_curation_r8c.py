"""Round-8c operators: wav_zcr_report, strip_markup,
release_quality_drift composition.
"""

from pyspark.sql import functions as F

from goka_spark.functions import multimodal as M
from goka_spark.functions import text as T


# ----------------------------------------------------- wav_zcr_report

def test_wav_zcr_counts_sign_flips_exactly(spark):
    """ZCR over a decoded clip matches a direct numpy count of
    strict sign-bit flips on the same synthesized signal."""
    import numpy as np

    spec = spark.createDataFrame([(7, 40, 7), (8, 1, 8)],
                                 "doc_id long, n int, seed long")
    blobs = M.encode_wav(spec, "doc_id", "n", "seed", rate=8000)
    got = {r["doc_id"]: r for r in M.wav_zcr_report(blobs).collect()}

    s = ((7 * 7 + np.arange(40) * 13) % 65536) - 32768
    neg = s < 0
    nc = int((neg[1:] != neg[:-1]).sum())
    assert got[7]["n_samples"] == 40
    assert got[7]["n_crossings"] == nc
    assert got[7]["zcr_e6"] == nc * 1_000_000 // 39

    # <2 samples: no adjacent pair, report zeros (no div-by-zero)
    assert (got[8]["n_crossings"], got[8]["zcr_e6"]) == (0, 0)


def test_wav_zcr_constant_signal_is_zero(spark):
    """A clip that never changes sign reports zero crossings.  seed=0
    gives s_i = (13i) % 65536 - 32768 < 0 for i < 2521, so a short
    clip stays all-negative."""
    spec = spark.createDataFrame([(1, 100, 0)],
                                 "doc_id long, n int, seed long")
    r = M.wav_zcr_report(
        M.encode_wav(spec, "doc_id", "n", "seed", rate=8000)).collect()[0]
    assert r["n_crossings"] == 0 and r["zcr_e6"] == 0


# ------------------------------------------------------ strip_markup

def test_strip_markup_drops_tags_scripts_entities(spark):
    html = ('<html><head><style>p { color: red; }</style></head>'
            '<body><h1>Title</h1><p>Hello <b>world</b>.</p>'
            '<script>var x = "<p>not text</p>";</script>'
            '&lt;tag&gt; &amp; &quot;q&quot;&nbsp;&#39;n&#39;'
            '</body></html>')
    df = spark.createDataFrame([(1, html)], "doc_id long, text string")
    out = df.select(T.strip_markup(F.col("text")).alias("c")).collect()[0]
    assert out["c"] == 'Title Hello world . <tag> & "q" \'n\''


def test_strip_markup_plain_text_roundtrip(spark):
    """Markup-free text passes through modulo whitespace collapse —
    the identity contract that makes the op safe to run corpus-wide."""
    df = spark.createDataFrame([(1, "plain  text,  no tags.")],
                               "doc_id long, text string")
    out = df.select(T.strip_markup(F.col("text")).alias("c")).collect()[0]
    assert out["c"] == "plain text, no tags."


def test_strip_markup_decodes_amp_last(spark):
    """&amp;lt; decodes to the LITERAL '&lt;' (one pass, amp last),
    never to '<' — double-decoding corrupts pre-escaped corpora."""
    df = spark.createDataFrame([(1, "a &amp;lt; b")],
                               "doc_id long, text string")
    out = df.select(T.strip_markup(F.col("text")).alias("c")).collect()[0]
    assert out["c"] == "a &lt; b"


# -------------------------------------------- release_quality_drift

def test_release_quality_drift_shares_sum_and_law(spark, sf_dir):
    """Bucket shares sum to ~1e6 per release (integer-floor slack
    < n_buckets) and the old-side counts equal a direct bucket
    count over the corpus."""
    from goka_spark.queries.llmdata import release_quality_drift
    from goka_spark.functions import text as TT

    out = release_quality_drift(spark, sf_dir).collect()
    t_old = sum(r["n_old"] for r in out)
    t_new = sum(r["n_new"] for r in out)
    assert sum(r["share_old_e6"] for r in out) > 1_000_000 - len(out)
    assert sum(r["share_new_e6"] for r in out) > 1_000_000 - len(out)
    for r in out:
        assert r["delta_e6"] == r["share_new_e6"] - r["share_old_e6"]
        assert r["share_old_e6"] == r["n_old"] * 1_000_000 // t_old

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    direct = {r["b"]: r["n"] for r in docs.select(
        F.least(F.floor(TT.quality_score(F.col("text")) * 10), F.lit(9))
        .alias("b")).groupBy("b").agg(F.count("*").alias("n")).collect()}
    got_old = {r["bucket"]: r["n_old"] for r in out if r["n_old"] > 0}
    assert got_old == {int(k): v for k, v in direct.items()}
