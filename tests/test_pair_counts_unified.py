"""The unified candidate mine: one _ngram_pair_counts pass at cutoff
C with per-pair min-shared-df tracking reproduces the EXACT output of
a direct mine at any cutoff c <= C via ``filter(_min_df <= c)``.

Why this is lossless (the cutoff-monotone containment argument the
r14 checklist asked to prove before unifying the auto-cutoff mine
with the max_df=50 session mine):

- the pair SET at cutoff c is {(a, b) : a, b share >= 1 shingle with
  df <= c}; for c <= C every such pair also shares that shingle at
  cutoff C, so pairs(c) is a subset of pairs(C), identified exactly
  by min(shared cold df) <= c;
- the VALUES (_shared, _sz_a, _sz_b) are cutoff-independent: _shared
  is the full intersection |A ∩ B| under any cutoff (cold_shared +
  hot-set correction always sums to it), and the sizes never depend
  on pruning.
"""

from pyspark.sql import functions as F

import goka_spark.functions.dedup as D

# A corpus engineered so the two cutoffs genuinely differ: "w1 w2 w3"
# is a hot shingle shared by EVERY doc (df = 6 > 2), the "aN bN cN dN"
# tails give each adjacent pair a rare shared shingle, and docs 5/6
# share ONLY hot shingles so they appear at cutoff 6 but not 2.
_DOCS = [
    (1, "w1 w2 w3 a1 b1 c1 d1"),
    (2, "w1 w2 w3 a1 b1 c1 e2"),
    (3, "w1 w2 w3 a3 b3 c3 d3"),
    (4, "w1 w2 w3 a3 b3 c3 e4"),
    (5, "w1 w2 w3 x5 y5 z5 q5"),
    (6, "w1 w2 w3 x6 y6 z6 q6"),
]


def _mine(spark, cutoff, **kw):
    df = spark.createDataFrame(_DOCS, ["doc_id", "text"])
    return D._ngram_pair_counts(df, "doc_id", "text", n=3,
                                max_df=cutoff, **kw)


def test_unified_mine_filter_equals_direct_mine(spark):
    big = _mine(spark, 6, track_min_df=True)
    assert "_min_df" in big.columns
    rows_big = {tuple(r) for r in big.collect()}
    # the tracked column never exceeds the mining cutoff
    assert all(r[-1] <= 6 for r in rows_big)
    for c in (2, 3, 6):
        direct = {tuple(r) for r in _mine(spark, c).collect()}
        filtered = {tuple(r)[:-1] for r in rows_big if r[-1] <= c}
        assert filtered == direct, f"cutoff {c}: {filtered} != {direct}"


def test_unified_mine_values_are_cutoff_independent(spark):
    """_shared from the C=6 mine equals _shared from the c=2 mine on
    the common pairs — the hot-set correction always restores the full
    intersection regardless of where the cold/hot line sits."""
    big = {(r.id_a, r.id_b): (r._shared, r._sz_a, r._sz_b)
           for r in _mine(spark, 6, track_min_df=True).collect()}
    small = {(r.id_a, r.id_b): (r._shared, r._sz_a, r._sz_b)
             for r in _mine(spark, 2).collect()}
    assert set(small) <= set(big)
    for k, v in small.items():
        assert big[k] == v


def test_untracked_default_schema_unchanged(spark):
    assert _mine(spark, 2).columns == [
        "id_a", "id_b", "_shared", "_sz_a", "_sz_b"]


def test_query_layer_auto_equals_fresh_auto_mine(spark, sf_dir):
    """The registry ngram_jaccard_auto (unified-mine projection) is
    row-identical to a from-scratch max_df='auto' library mine."""
    from goka_spark.queries.base import load
    from goka_spark.queries.llmdata import ngram_jaccard_auto

    docs = load(spark, sf_dir, "documents")["documents"]
    fresh = {tuple(r) for r in D.ngram_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.05,
        max_df="auto").collect()}
    got = {tuple(r) for r in ngram_jaccard_auto(spark, sf_dir).collect()}
    assert got == fresh
