"""Unit tests for the r14 kernels — each engine law checked against an
independent pure-Python reference (the oracle cross-check proves
engine ≡ DuckDB; these prove the shared law is the INTENDED one)."""

import math

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F


def _quad_pixels(w, h, seed):
    i = np.arange(w * h, dtype=np.int64) + seed
    return ((i * i) % 256).reshape(h, w)


def _naive_phash(w, h, seed):
    """O(n⁴) reference DCT + bit law, written independently of the
    separable matmul in M.image_phash."""
    gray = _quad_pixels(w, h, seed)
    ys = [(y * h) // 16 for y in range(16)]
    xs = [(x * w) // 16 for x in range(16)]
    g = [[int(gray[ys[y], xs[x]]) for x in range(16)] for y in range(16)]
    C = [[round(math.cos(math.pi * (2 * x + 1) * u / 32) * 4096)
          for u in range(8)] for x in range(16)]
    coef = [[sum(C[y][u] * g[y][x] * C[x][v]
                 for y in range(16) for x in range(16))
             for v in range(8)] for u in range(8)]
    flat = [coef[u][v] for u in range(8) for v in range(8)][1:]
    tot = sum(flat)
    hval = 0
    for k, v in enumerate(flat):
        if 63 * v > tot:
            hval |= 1 << k
    return hval


def test_image_phash_matches_naive_dct(spark):
    """The separable int64 matmul pHash must equal the O(n⁴)
    textbook double-sum on identical pixels, for several shapes
    including w,h < 16 (floor map repeats pixels)."""
    from goka_spark.functions import multimodal as M

    specs = [(0, 4, 3, 0), (1, 16, 9, 7), (2, 9, 5, 13), (3, 5, 4, 49)]
    df = spark.createDataFrame(specs, "doc_id long, w int, h int, seed long")
    got = {r.doc_id: r.phash
           for r in M.image_phash(
               M.encode_ppm_quad(df, "doc_id", "w", "h", "seed")).collect()}
    for doc_id, w, h, seed in specs:
        assert got[doc_id] == _naive_phash(w, h, seed), (doc_id, w, h, seed)


def test_phash_recovers_planted_texture_groups(spark, sf_dir):
    """Same quad law + doc_id%50 replication as C71: the DCT hash
    must recover exactly the 50 planted groups."""
    from goka_spark.queries.llmdata import image_phash_dedup

    rows = image_phash_dedup(spark, sf_dir).collect()
    by_rep = {}
    for r in rows:
        by_rep.setdefault(r.doc_id % 50, set()).add(r.phash)
    # one hash per replication class...
    assert all(len(v) == 1 for v in by_rep.values())
    # ...and all 50 classes separable
    assert len({next(iter(v)) for v in by_rep.values()}) == 50


def test_kmv_topk_two_phase_equals_global(spark, sf_dir):
    """The two-phase k-smallest inside kmv_source_overlap must agree
    with a naive global sort of the same per-source hash sets — the
    sketch columns are only valid if the distributed top-k is the
    true top-k.  Checked via kth_hv/k_union per pair against a
    pandas reference."""
    import hashlib

    from goka_spark.queries.llmdata import kmv_source_overlap

    got = {(r.source_a, r.source_b): (r.k_union, r.kth_hv, r.matched)
           for r in kmv_source_overlap(spark, sf_dir).collect()}

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["source", "text"])
    sets = {}
    for src, text in zip(docs["source"], docs["text"]):
        ws = [w for w in text.split(" ") if w]
        grams = {" ".join(ws[i:i + 3]) for i in range(max(len(ws) - 2, 0))} \
            if len(ws) >= 3 else {" ".join(ws)} if ws else set()
        sets.setdefault(src, set()).update(grams)
    K = 128
    hv = {s: sorted({int(hashlib.md5(g.encode()).hexdigest()[:8], 16)
                     & 0x7FFFFFFF for g in gs})[:K]
          for s, gs in sets.items()}
    for (sa, sb), (k_union, kth, matched) in got.items():
        union = sorted(set(hv[sa]) | set(hv[sb]))[:K]
        assert k_union == len(union)
        assert kth == union[-1]
        assert matched == len(set(union) & set(hv[sa]) & set(hv[sb]))


def test_scd2_runs_collapse(spark, sf_dir):
    """SCD2 intervals vs a plain-Python run-length pass over each
    user's ordered events: same run count, same boundaries, same
    open current interval."""
    from goka_spark.queries.analytics import scd2_intervals

    rows = scd2_intervals(spark, sf_dir).collect()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["us"] = ev["ts"].astype("datetime64[us]").astype("int64")
    ref = {}
    for uid, grp in ev.sort_values(["user_id", "us", "event_id"]) \
                      .groupby("user_id"):
        runs = []
        for st, us in zip(grp["event_type"], grp["us"]):
            if runs and runs[-1][0] == st:
                runs[-1][2] += 1
            else:
                runs.append([st, int(us), 1])
        ref[uid] = runs
    by_user = {}
    for r in sorted(rows, key=lambda r: (r.user_id, r.version)):
        by_user.setdefault(r.user_id, []).append(r)
    assert set(by_user) == set(ref)
    for uid, rs in by_user.items():
        assert len(rs) == len(ref[uid])
        for i, r in enumerate(rs):
            st, us, n = ref[uid][i]
            assert (r.state, r.valid_from_us, r.n_events) == (st, us, n)
            if i + 1 < len(rs):
                assert r.valid_to_us == ref[uid][i + 1][1]
                assert not r.is_current
            else:
                assert r.valid_to_us is None and r.is_current


def test_watermark_two_pass_prefix_max_equals_naive(spark, sf_dir):
    """B100's distributed two-pass running max must equal the naive
    single-pass replay of the arrival stream."""
    from goka_spark.queries.analytics import watermark_drop_sweep

    got = {r.wm_min: (r.n_events, r.n_dropped, r.n_groups_affected)
           for r in watermark_drop_sweep(spark, sf_dir).collect()}
    ev = pd.read_parquet(f"{sf_dir}/events.parquet") \
           .sort_values("event_id")
    us = ev["ts"].astype("datetime64[us]").astype("int64")
    types = ev["event_type"].tolist()
    for wmin in (0, 5, 15):
        run_max, dropped, groups = -1, 0, set()
        for t, u in zip(types, us):
            u = int(u)
            if run_max >= 0 and u < run_max - wmin * 60_000_000:
                dropped += 1
                groups.add((t, u // 3_600_000_000))
            run_max = max(run_max, u)
        assert got[wmin] == (len(ev), dropped, len(groups)), wmin


def test_bm25_score_law(spark, sf_dir):
    """BM25 per-doc scores vs an independent float reference: the
    integerized engine score must sit within 1 micro-unit of
    1e6·Σ_t idf·tf(k1+1)/(tf+k1(1−b+b·dl/avgdl)) per matched
    term."""
    from goka_spark.queries.llmdata import bm25_topk

    rows = bm25_topk(spark, sf_dir).collect()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    toks = {d: [w for w in t.split(" ") if w]
            for d, t in zip(docs["doc_id"], docs["text"])}
    N = len(toks)
    T = sum(len(v) for v in toks.values())
    avgdl = T / N
    terms = ["spark", "join", "window"]
    df_t = {t: sum(1 for v in toks.values() if t in v) for t in terms}
    k1, b = 1.2, 0.75
    for r in rows:
        ref = 0.0
        n_terms = 0
        for t in terms:
            tf = toks[r.doc_id].count(t)
            if not tf:
                continue
            n_terms += 1
            idf = math.log((N + 1) / (df_t[t] + 0.5))
            dl = len(toks[r.doc_id])
            ref += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
        assert r.n_terms == n_terms
        assert abs(r.score_e6 - ref * 1e6) <= n_terms + 1, r
