"""Unigram-LM tokenizer (functions/unigram.py): Spark ≡ pure-Python
property pinning plus planted semantics.  Oracle hash-equivalence
runs in tools/verify_local.py / the driver."""

import random

import pytest
from pyspark.sql import functions as F

from goka_spark.functions import unigram as U


def _word_freq(rows):
    wf = {}
    for _, t in rows:
        for w in t.split():
            wf[w] = wf.get(w, 0) + 1
    return wf


def test_viterbi_prefers_cheap_long_pieces():
    # "abab" as one piece beats four chars when its cost is low
    costs = {"a": 100, "b": 100, "ab": 150, "abab": 250}
    assert U.viterbi_py("abab", costs) == ["abab"]
    assert U.viterbi_py("ababa", costs) == ["abab", "a"]


def test_viterbi_tie_breaks_are_total():
    # equal-cost paths: fewer pieces wins, then lexicographic
    costs = {"a": 100, "b": 100, "ab": 200, "ba": 200}
    # "aab": a+ab (300, 2 pieces) beats a+a+b (300, 3 pieces)
    assert U.viterbi_py("aab", costs) == ["a", "ab"]


def test_viterbi_raises_on_uncoverable_word():
    with pytest.raises(ValueError):
        U.viterbi_py("xyz", {"a": 1})


def test_seed_keeps_all_chars_and_caps_multi():
    wf = {"abc": 5, "abd": 3}
    seed = U.seed_py(wf, max_len=3, seed_size=2)
    assert {"a", "b", "c", "d"} <= set(seed)
    multi = [p for p in seed if len(p) > 1]
    assert len(multi) == 2
    assert seed["ab"] == 8            # occurrence-weighted
    assert "ab" in multi              # most frequent bigram survives


def test_train_prunes_to_target_and_floors_chars():
    wf = {"abab": 10, "cd": 1}
    pieces = U.train_py(wf, vocab_target=1, seed_size=8, n_iters=2)
    multi = [p for p in pieces if len(p) > 1]
    assert len(multi) == 1            # pruned to target
    for ch in "abcd":
        assert pieces[ch] >= 1        # chars never pruned, count >= 1


@pytest.mark.parametrize("seed", [3, 11])
def test_spark_train_equals_python(spark, seed):
    random.seed(seed)
    vocab = ["spark", "sparkly", "parking", "bark", "low", "lowest",
             "abab", "ababab", "data", "database"]
    rows = [(i, " ".join(random.choices(vocab,
                                        k=random.randint(2, 10))))
            for i in range(50)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    py = U.train_py(_word_freq(rows), vocab_target=12, seed_size=48,
                    n_iters=3)
    sp = U.unigram_train(docs, "doc_id", "text", vocab_target=12,
                         seed_size=48, n_iters=3)
    assert sp == py


def test_token_count_and_encode_consistent(spark):
    rows = [(1, "abab abab cd"), (2, ""), (3, "abab")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pieces = U.unigram_train(docs, "doc_id", "text", vocab_target=4,
                             seed_size=16, n_iters=2)
    cnt = {r["doc_id"]: r for r in
           U.unigram_token_count(docs, "doc_id", "text", pieces)
           .collect()}
    enc = {r["doc_id"]: r for r in
           U.unigram_encode(docs, "doc_id", "text", pieces).collect()}
    assert cnt[2]["n_words"] == 0 and cnt[2]["uni_tokens"] == 0
    assert enc[2]["token_str"] == "" and enc[2]["n_tokens"] == 0
    for d in (1, 3):
        assert cnt[d]["uni_tokens"] == enc[d]["n_tokens"]
        assert len(enc[d]["token_str"].split()) == enc[d]["n_tokens"]
        # concatenating the pieces recovers the original text
        assert enc[d]["token_str"].replace(" ", "") == \
            rows[d - 1][1].replace(" ", "")


def test_fertility_and_recall_invariants(spark, sf_dir):
    """Registry-level invariants for the r7 evaluation surfaces:
    fertility >= 1.0 (every word is >= 1 token) and recall in
    [0, 1] with hits <= k."""
    from goka_spark.queries.llmdata import (ann_recall_eval,
                                            tokenizer_fertility)
    fert = tokenizer_fertility(spark, sf_dir).collect()
    assert fert, "at least one source"
    for r in fert:
        assert r["bpe_fertility_e6"] >= 1_000_000
        assert r["uni_fertility_e6"] >= 1_000_000
        assert r["bpe_tokens"] >= r["n_words"]
    rec = ann_recall_eval(spark, sf_dir).collect()
    assert len(rec) == 20
    for r in rec:
        assert 0 <= r["n_hits"] <= 5
        assert r["recall_e6"] == r["n_hits"] * 200_000


def test_nprobe_sweep_monotone(spark, sf_dir):
    """Recall must be nondecreasing in n_probe (smaller probe sets
    are subsets) and n_probe=max covers at least what n_probe=1 did."""
    from goka_spark.queries.llmdata import ann_nprobe_sweep
    rows = ann_nprobe_sweep(spark, sf_dir).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], {})[r["n_probe"]] = r["n_hits"]
    assert len(by_q) == 20
    for q, h in by_q.items():
        assert sorted(h) == [1, 2, 4, 8]
        assert h[1] <= h[2] <= h[4] <= h[8], (q, h)
