"""gate_signals_kernel must equal the lang_id / quality_score /
repetition_ratio Column expressions value-for-value (exact doubles —
the corpus_filter_pipeline oracle replays the expression arithmetic,
so the kernel must reproduce it bit-for-bit), on adversarial inputs:
empty / whitespace-only / single-word docs, unicode words, ASCII
punctuation soup, stopword mixes that exercise every lang-vote
branch, short docs below the shingle width, and NULL text.
"""

import random

from pyspark.sql import functions as F

from goka_spark.functions import text as T


def _adversarial_docs():
    rnd = random.Random(1729)
    sw = [w for ws in T.STOPWORDS.values() for w in ws]
    pieces = sw + ["Hello", "WORLD", "a", "zz", "x" * 200, "42",
                   "3.14", "über", "naïve", "日本語", "!!!", "?!",
                   "foo_bar", "semi;colon", "tab\tsep", "(paren)",
                   "--", "#hash", "&amp;"]
    docs = [
        (0, None),
        (1, ""),
        (2, "   \t\n \x0b\f\r "),
        (3, "word"),
        (4, "two words"),
        (5, "the the the the"),
        (6, "der und die das ist"),
        (7, "el la de que y"),
        (8, "le la et de un est"),
        (9, "a b a b a b a b a b"),
        (10, "!!! ??? ;;; ::: @@@ $$$"),
    ]
    for i in range(11, 80):
        k = rnd.randint(0, 40)
        sep = rnd.choice([" ", "  ", "\t", "\n", " \t "])
        docs.append((i, sep.join(rnd.choice(pieces) for _ in range(k))))
    return docs


def test_gate_kernel_matches_expressions(spark):
    df = spark.createDataFrame(_adversarial_docs(),
                               "doc_id long, text string")
    new = {r["doc_id"]: (r["_lang"], r["_q"], r["_rep"])
           for r in T.gate_signals_kernel(df, "doc_id", "text").collect()}
    old = {r["doc_id"]: (r["_lang"], r["_q"], r["_rep"])
           for r in df.select(
               "doc_id",
               T.lang_id(F.col("text")).alias("_lang"),
               T.quality_score(F.col("text")).alias("_q"),
               T.repetition_ratio(F.col("text"), 3).alias("_rep"))
           .collect()}
    assert set(new) == set(old)
    for k in old:
        assert new[k] == old[k], (k, new[k], old[k])


def test_gate_kernel_passes_text_through(spark):
    docs = [(1, "keep this text"), (2, None), (3, "")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["doc_id"]: r["text"]
           for r in T.gate_signals_kernel(df, "doc_id", "text").collect()}
    assert out == dict(docs)
