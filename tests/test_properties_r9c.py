"""Property tests for the session-3 round-9 kernels: random inputs,
independent pure-Python references.

- skipgram pair counts == a brute-force O(L·w) python enumeration
- readability counts == a python syllable/sentence reference
- growth-accounting identities: active = new+retained+resurrected per
  week, churn conservation (every churn has a prior active week), and
  stream≡batch on random epoch splits is covered in
  test_windows_joins (real data); here the batch table vs a
  per-user python simulation.
"""

import random


def _brute_skipgrams(words, window=4):
    from collections import Counter

    c = Counter()
    for i in range(len(words)):
        for o in range(1, window + 1):
            if i + o < len(words):
                a, b = words[i], words[i + o]
                c[(min(a, b), max(a, b))] += 1
    return c


def test_skipgram_counts_match_bruteforce_random(spark):
    rng = random.Random(7)
    vocab = ["w%d" % i for i in range(6)]
    rows = []
    for d in range(8):
        n = rng.randint(0, 15)
        rows.append((d, " ".join(rng.choice(vocab) for _ in range(n))))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    from goka_spark.functions import text as T

    got = {(r.w1, r.w2): r.cnt_ab
           for r in T.skipgram_pmi_topk(docs, "doc_id", "text",
                                        min_count=1, k=10000).collect()}
    from collections import Counter

    want = Counter()
    for _, txt in rows:
        want.update(_brute_skipgrams(txt.split()))
    assert got == dict(want)


def _brute_readability(text):
    import re

    words = [w for w in text.split(" ") if w]
    sent = max(len(re.findall(r"[.!?]+", text)), 1)
    syl = sum(max(len(re.findall(r"[aeiouy]+", w)), 1) for w in words)
    w_ = max(len(words), 1)
    fre = 206835 - 1015 * len(words) // sent - 84600 * syl // w_
    return len(words), sent, syl, fre


def test_readability_matches_reference_random(spark):
    rng = random.Random(11)
    alphabet = "abcdefghijklmnopqrstuvwxyz.!? "
    rows = []
    for d in range(30):
        n = rng.randint(0, 60)
        txt = "".join(rng.choice(alphabet) for _ in range(n))
        # collapse runs of spaces are fine — split(" ") filters empties
        rows.append((d, txt))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    from goka_spark.functions import text as T

    got = {r.doc_id: (r.n_words, r.n_sentences, r.n_syllables, r.fre_e3)
           for r in T.readability_fre(docs, "doc_id", "text").collect()}
    for d, txt in rows:
        w, s, syl, fre = _brute_readability(txt)
        if w == 0:
            syl = 0
        assert got[d] == (w, s, syl, fre), (d, repr(txt))


def _simulate_growth(user_weeks):
    """Python reference of B73 on {user: sorted weeks}."""
    from collections import defaultdict

    out = defaultdict(lambda: [0, 0, 0, 0])     # new, ret, res, churn
    mx = max(w for ws in user_weeks.values() for w in ws)
    for ws in user_weeks.values():
        ws = sorted(set(ws))
        for i, w in enumerate(ws):
            if i == 0:
                out[w][0] += 1
            elif w == ws[i - 1] + 1:
                out[w][1] += 1
            else:
                out[w][2] += 1
                out[ws[i - 1] + 1][3] += 1
        if ws[-1] < mx:
            out[ws[-1] + 1][3] += 1
    return out


def test_growth_accounting_matches_simulation_random(spark, tmp_path,
                                                     monkeypatch):
    from datetime import datetime, timedelta

    import goka_spark.queries.analytics as QA
    from goka_spark.queries.analytics import growth_accounting

    rng = random.Random(13)
    user_weeks = {}
    rows = []
    eid = 0
    for u in range(1, 25):
        ws = sorted(rng.sample(range(0, 9), rng.randint(1, 5)))
        user_weeks[u] = ws
        for w in ws:
            eid += 1
            rows.append((eid, u, datetime(1970, 1, 1)
                         + timedelta(days=7 * w + rng.randint(0, 6))))
    ev = spark.createDataFrame(rows,
                               "event_id long, user_id long, ts timestamp")
    src = str(tmp_path / "events.parquet")
    ev.write.parquet(src)
    monkeypatch.setattr(QA, "load",
                        lambda s, sf, *t: {"events": s.read.parquet(src)})
    got = {r.week: (r.n_new, r.n_retained, r.n_resurrected, r.n_churned)
           for r in growth_accounting(spark, "x").collect()}
    want = _simulate_growth(user_weeks)
    assert got == {w: tuple(v) for w, v in want.items()}
    # the identity: every row's active = new + retained + resurrected
    for r in growth_accounting(spark, "x").collect():
        assert r.n_active == r.n_new + r.n_retained + r.n_resurrected


def test_revenue_gini_matches_textbook_random(spark, tmp_path, monkeypatch):
    """Random per-user revenues: the frequency closed form + the
    top-decile interval split equal a brute-force sorted-list
    computation."""
    from datetime import datetime

    import goka_spark.queries.analytics as QA
    from goka_spark.queries.analytics import revenue_gini

    rng = random.Random(23)
    rows = []
    eid = 0
    revs = {}
    for u in range(1, 31):
        total = 0
        for _ in range(rng.randint(1, 4)):
            eid += 1
            v = rng.randint(1, 500) / 7.0
            total += round(v * 100)
            rows.append((eid, u, "purchase", v, datetime(2024, 1, 1)))
        revs[u] = total
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, "
              "value double, ts timestamp")
    src = str(tmp_path / "events.parquet")
    ev.write.parquet(src)
    monkeypatch.setattr(QA, "load",
                        lambda s, sf, *t: {"events": s.read.parquet(src)})
    r = revenue_gini(spark, "x").collect()[0]

    xs = sorted(revs.values())
    n, s = len(xs), sum(xs)
    a = sum((i + 1) * x for i, x in enumerate(xs))
    assert r.n_buyers == n and r.revenue_e2 == s
    assert r.gini_e6 == (2 * a - (n + 1) * s) * 1_000_000 // (n * s)
    top = sum(xs[n - n // 10:])
    assert r.top_decile_share_e6 == top * 1_000_000 // s
