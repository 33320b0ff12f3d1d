"""Property tests for the late-round-9 kernels: random inputs,
independent pure-Python references.

- activity_gini: the count-frequency closed form vs the textbook
  per-item Gini on the sorted list, exact integer for exact integer.
- user_activity_deciles interval math: per-decile user counts sum to
  n, events sum to the total, and each decile's size matches its
  index range ⌊dn/10⌋ − ⌊(d−1)n/10⌋.
- drawdown epoch-merge law: mdd(AB) = max(mdd_A, mdd_B,
  peak_A − min_B) vs a brute-force scan of the concatenated series.
- OHLC partial merge: merging any 2-way split of a series equals the
  whole-series candle (the carried-order-key monoid).
"""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SLOW = settings(max_examples=25, deadline=None,
                suppress_health_check=list(HealthCheck))


counts_strategy = st.lists(st.integers(min_value=1, max_value=40),
                           min_size=1, max_size=30)


def _gini_reference(counts):
    xs = sorted(counts)
    n, s = len(xs), sum(xs)
    a = sum((i + 1) * x for i, x in enumerate(xs))
    return (2 * a - (n + 1) * s) * 1_000_000 // (n * s)


def _gini_freq_form(counts):
    from collections import Counter

    freq = Counter(counts)
    k = 0
    a = 0
    for c in sorted(freq):            # ascending, like the window
        u = freq[c]
        a += c * (u * k + u * (u + 1) // 2)
        k += u
    n, s = len(counts), sum(counts)
    return (2 * a - (n + 1) * s) * 1_000_000 // (n * s)


@given(counts_strategy)
@SLOW
def test_gini_closed_form_equals_textbook(counts):
    assert _gini_freq_form(counts) == _gini_reference(counts)


@given(counts_strategy)
@SLOW
def test_decile_interval_math(counts):
    from collections import Counter

    freq = Counter(counts)
    n = len(counts)
    total = sum(counts)
    # replicate the query's interval arithmetic (cnt DESC cumulative)
    rows = []
    cum0 = 0
    for c in sorted(freq, reverse=True):
        rows.append((c, freq[c], cum0))
        cum0 += freq[c]
    per = {}
    for d in range(1, 11):
        lo, hi = (d - 1) * n // 10, d * n // 10
        nu = ne = 0
        for c, u, k in rows:
            take = min(hi, k + u) - max(lo, k)
            if take > 0:
                nu += take
                ne += take * c
        per[d] = (nu, ne)
    assert sum(v[0] for v in per.values()) == n
    assert sum(v[1] for v in per.values()) == total
    for d in range(1, 11):
        assert per[d][0] == d * n // 10 - (d - 1) * n // 10


series_strategy = st.lists(st.integers(min_value=-50, max_value=50),
                           min_size=1, max_size=40)


def _mdd(xs):
    peak, mdd = xs[0], 0
    for x in xs:
        peak = max(peak, x)
        mdd = max(mdd, peak - x)
    return mdd


@given(series_strategy, st.integers(min_value=0, max_value=40))
@SLOW
def test_drawdown_merge_law(xs, cut):
    cut = min(cut, len(xs))
    a, b = xs[:cut], xs[cut:]
    if not a or not b:
        return
    merged = max(_mdd(a), _mdd(b), max(a) - min(b))
    assert merged == _mdd(xs)


@given(st.lists(st.tuples(st.integers(0, 100), st.integers(-99, 99)),
                min_size=1, max_size=30),
       st.integers(min_value=0, max_value=1))
@SLOW
def test_ohlc_partial_merge(points, parity):
    """Split a (ts, value) series by index parity, compute partial
    candles with carried (ts, idx) order keys, merge, compare to the
    whole-series candle."""
    pts = [(t, i, v) for i, (t, v) in enumerate(points)]

    def candle(rows):
        if not rows:
            return None
        by_ord = sorted(rows, key=lambda r: (r[0], r[1]))
        return {
            "open": by_ord[0][2], "close": by_ord[-1][2],
            "high": max(r[2] for r in rows),
            "low": min(r[2] for r in rows),
            "vol": len(rows),
            "oord": (by_ord[0][0], by_ord[0][1]),
            "cord": (by_ord[-1][0], by_ord[-1][1]),
        }

    a = candle([r for r in pts if r[1] % 2 == parity])
    b = candle([r for r in pts if r[1] % 2 != parity])
    whole = candle(pts)
    parts = [p for p in (a, b) if p]
    merged = {
        "open": min(parts, key=lambda p: p["oord"])["open"],
        "close": max(parts, key=lambda p: p["cord"])["close"],
        "high": max(p["high"] for p in parts),
        "low": min(p["low"] for p in parts),
        "vol": sum(p["vol"] for p in parts),
    }
    for k in merged:
        assert merged[k] == whole[k], k
