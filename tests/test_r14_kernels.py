"""Round-14 Arrow-kernel parity pins.

Each optimized operator replaced a JVM expression formulation with an
Arrow-batched kernel that must replay the identical IEEE double
arithmetic.  These tests rebuild the ORIGINAL expression pipelines
inline and assert exact (bitwise) equality on randomized inputs —
the same discipline as test_minhash_kernel / test_gate_kernel.
"""

from __future__ import annotations

import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from goka_spark.functions import ann_index as A
from goka_spark.functions import similarity as S
from goka_spark.functions.similarity import _as_double, dot, norm
from tests.conftest import spark  # noqa: F401


def _rand_vecs(n: int, dim: int, seed: int) -> list:
    rng = random.Random(seed)
    return [(i, [rng.uniform(-2.0, 2.0) for _ in range(dim)])
            for i in range(n)]


# ---------------------------------------------------------------- PQ


def _old_pq_d9(emb, books, dim, m, ksub):
    """The pre-r14 literal-expression formulation, verbatim."""
    dsub = dim // m
    sq = " + ".join(f"(e[{i}] * e[{i}])" for i in range(dim))
    cv = (emb.selectExpr(
        "vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) AS e")
        .selectExpr("vec_id", "e", f"SQRT({sq}) AS n")
        .selectExpr("vec_id", "transform(e, x -> x / n) AS v"))

    def lit(x: float) -> str:
        return f"CAST('{x!r}' AS DOUBLE)"

    def dist_list(j: int) -> str:
        return ", ".join(
            " + ".join(
                f"((v[{j * dsub + d}] - {lit(books[j][c][d])})"
                f" * (v[{j * dsub + d}] - {lit(books[j][c][d])}))"
                for d in range(dsub))
            for c in range(ksub))

    mins = cv.selectExpr(
        "vec_id",
        *[f"array_min(array({dist_list(j)})) AS md{j}"
          for j in range(m)])
    stacked = mins.selectExpr(
        "stack({}, {}) AS (subspace, md)".format(
            m, ", ".join(f"{j}L, md{j}" for j in range(m))))
    return stacked.selectExpr(
        "subspace", "CAST(FLOOR(1e9 * md + 0.5) AS BIGINT) AS d9")


def test_pq_distortion_kernel_matches_expression(spark):  # noqa: F811
    dim, m, ksub = 16, 4, 4
    emb = spark.createDataFrame(
        _rand_vecs(60, dim, seed=7),
        "vec_id long, embedding array<float>")
    rng = random.Random(11)
    books = [[[rng.uniform(-0.5, 0.5) for _ in range(dim // m)]
              for _ in range(ksub)] for _ in range(m)]
    old = sorted(tuple(r) for r in
                 _old_pq_d9(emb, books, dim, m, ksub).collect())
    new = sorted(tuple(r) for r in
                 A.pq_distortion_d9(emb, "embedding", books).collect())
    assert new == old  # exact integers — any float drift would show


# ------------------------------------------------- quantized recall


def _old_quantized_scored(emb, id_col, vec_col, n_queries):
    """The pre-r14 zip_with/fold scoring frame, verbatim."""
    rng = S._int8_ranges(emb, vec_col)
    base = (emb.select(F.col(id_col).alias("_id"),
                       _as_double(F.col(vec_col)).alias("_v"))
            .join(F.broadcast(rng)))
    d_ = F.zip_with("_v", "_mns", lambda x, mn: x - mn)
    q_ = F.zip_with(d_, F.col("_rgs"),
                    lambda d, r: F.when(r > 0, F.least(
                        F.lit(255), F.greatest(
                            F.lit(0), F.floor(d * 255.0 / r))))
                    .otherwise(0).cast("long"))
    delta = F.zip_with(q_, F.col("_rgs"),
                       lambda q, r: (q + 0.5) * r / 255.0)
    xhat = F.zip_with(F.col("_mns"), delta, lambda mn, t: mn + t)
    vx = base.select("_id", "_v", xhat.alias("_x"))
    qs = (vx.filter(F.col("_id") < n_queries)
          .select(F.col("_id").alias("query_id"),
                  F.col("_v").alias("_qv"), F.col("_x").alias("_qx")))
    cs = vx.select(F.col("_id").alias("neighbor_id"),
                   F.col("_v").alias("_cv"), F.col("_x").alias("_cx"))
    pairs = cs.join(F.broadcast(qs),
                    F.col("query_id") != F.col("neighbor_id"))
    entries = [
        F.struct(F.lit(0).alias("_var"),
                 (dot(F.col("_qv"), F.col("_cv"))
                  / (norm(F.col("_qv")) * norm(F.col("_cv"))))
                 .alias("_cos")),
        F.struct(F.lit(1).alias("_var"),
                 (dot(F.col("_qx"), F.col("_cx"))
                  / (norm(F.col("_qx")) * norm(F.col("_cx"))))
                 .alias("_cos")),
    ]
    return (pairs.select("query_id", "neighbor_id",
                         F.explode(F.array(*entries)).alias("_e"))
            .select("query_id", "neighbor_id",
                    F.col("_e._var").alias("_var"),
                    F.col("_e._cos").alias("_cos")))


@pytest.mark.parametrize("seed", [3, 19])
def test_quantized_cosines_bitwise_equal(spark, seed):  # noqa: F811
    """Every per-pair cosine of the kernel path equals the old
    zip_with/fold SQL bit for bit (exact == on doubles), including a
    constant dimension (range 0 → the otherwise(0) arm)."""
    dim, n = 12, 40
    rows = _rand_vecs(n, dim, seed)
    # pin one dimension constant so rgs[d] == 0 exercises the 0-arm
    rows = [(i, v[:5] + [1.25] + v[6:]) for i, v in rows]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    old = {(r["query_id"], r["neighbor_id"], r["_var"]): r["_cos"]
           for r in _old_quantized_scored(
               emb, "vec_id", "embedding", 6).collect()}

    # kernel-side cosines: replicate via the public query result is
    # too coarse — instead compare through the same internals the
    # kernel uses, driven by the PUBLIC quantized_recall plumbing:
    # run the full query both ways and, separately, pin the scored
    # values by re-deriving them with numpy exactly as the kernel does
    rng_row = S._int8_ranges(emb, "embedding").collect()[0]
    mns = np.asarray(rng_row["_mns"], dtype=np.float64)
    rgs = np.asarray(rng_row["_rgs"], dtype=np.float64)
    data = {r["vec_id"]: np.asarray(r["_v"], dtype=np.float64)
            for r in emb.select(
                F.col("vec_id"),
                _as_double(F.col("embedding")).alias("_v")).collect()}

    def decode(v):
        d = v - mns
        with np.errstate(divide="ignore", invalid="ignore"):
            fl = np.floor(d * 255.0 / rgs)
        q = np.where(rgs > 0, np.minimum(255.0, np.maximum(0.0, fl)), 0.0)
        return mns + (q + 0.5) * rgs / 255.0

    def fold_dot(a, b):
        return np.cumsum(a * b)[-1]

    for (qid, nid, var), old_cos in old.items():
        qv, cv = data[qid], data[nid]
        if var == 1:
            qv, cv = decode(qv), decode(cv)
        got = fold_dot(qv, cv) / (np.sqrt(fold_dot(qv, qv))
                                  * np.sqrt(fold_dot(cv, cv)))
        assert got == old_cos, (qid, nid, var)


def test_quantized_recall_output_matches_old_pipeline(spark):  # noqa: F811
    """End-to-end: the public quantized_recall equals the full old
    pipeline (old scored frame + identical top-k/recall tail)."""
    from pyspark.sql import Window
    emb = spark.createDataFrame(
        _rand_vecs(50, 10, seed=23), "vec_id long, embedding array<float>")
    k, nq = 4, 8
    scored = _old_quantized_scored(emb, "vec_id", "embedding", nq)
    w = Window.partitionBy("_var", "query_id") \
        .orderBy(F.col("_cos").desc(), F.col("neighbor_id"))
    top = (scored.withColumn("rk", F.row_number().over(w))
           .filter(F.col("rk") <= k)
           .select("_var", "query_id", "neighbor_id"))
    full_top = top.filter(F.col("_var") == 0) \
        .select("query_id", "neighbor_id")
    qt = top.filter(F.col("_var") == 1)
    hits = (qt.join(full_top, ["query_id", "neighbor_id"], "left_semi")
            .agg(F.count("*").alias("_hit")))
    base = qt.agg(F.count("*").alias("_n"))
    old = (base.crossJoin(F.broadcast(hits))
           .select(F.col("_n").cast("long").alias("n_top"),
                   F.col("_hit").cast("long").alias("n_overlap"),
                   F.expr("_hit * 1000000L DIV greatest(_n, 1L)")
                   .cast("long").alias("recall_e6"))).collect()
    new = S.quantized_recall(emb, "vec_id", "embedding",
                             k=k, n_queries=nq).collect()
    assert [tuple(r) for r in new] == [tuple(r) for r in old]


# ------------------------------------------------------ PyFold.needs


def test_pyfold_needs_projection_same_fold_smaller_plan(spark):  # noqa: F811
    import pandas as pd  # noqa: F401
    from goka_spark.operators.folds import PyFold

    df = spark.createDataFrame(
        [(str(i % 3), i, float(i), "payload-%d" % i, "t%d" % (i % 2))
         for i in range(30)],
        "key string, event_id long, value double, props string, "
        "event_type string").withColumn("ts", F.col("event_id").cast(
            "timestamp"))

    def ewma(state, row):
        return state * 0.9 + row["value"]

    def mk(needs):
        return PyFold(func=ewma, init=0.0,
                      finish=lambda s: {"ewma": round(s, 3)},
                      state_schema="ewma double",
                      order_extra=["event_id"],
                      needs=needs).compile(df, "key", "ts")

    full = sorted(tuple(r) for r in mk(None).collect())
    slim = sorted(tuple(r) for r in mk(["value"]).collect())
    assert slim == full
    plan = mk(["value"])._jdf.queryExecution().executedPlan().toString()
    fmg = [ln for ln in plan.splitlines()
           if "MapInPandas" in ln or "FlatMapGroupsInPandas" in ln]
    assert fmg and all("props" not in ln and "event_type" not in ln
                       for ln in fmg), fmg


# ------------------------------------------------------ winnow keys


def _old_winnow_keys(df, id_col, text_col, k, w):
    """The pre-r14 interpreted-expression formulation, verbatim."""
    from goka_spark.functions.text import words

    ws = words(F.col(text_col))
    L = F.greatest(F.size(ws) - (k - 1), F.lit(1))
    grams = F.transform(
        F.sequence(F.lit(0), L - 1),
        lambda i: F.array_join(F.slice(ws, i + 1, k), " "))
    hs = F.transform(grams, lambda g: F.conv(
        F.substring(F.md5(g), 1, 8), 16, 10).cast("long"))
    d1 = df.select(F.col(id_col), hs.alias("_hs"),
                   L.cast("long").alias("_L"))
    hsc = F.col("_hs")
    n_win = F.greatest(F.col("_L") - (w - 1), F.lit(1))
    wl = F.least(F.lit(w), F.col("_L"))

    def _key(i):
        s = F.slice(hsc, i + 1, wl)
        m = F.array_min(s)
        pos = i + wl - F.array_position(F.reverse(s), m) + 1
        return pos.cast("long") * F.lit(4294967296) + m

    keys = F.array_sort(F.array_distinct(
        F.transform(F.sequence(F.lit(0), n_win - 1), _key)))
    return d1.select(F.col(id_col), F.col("_L"), keys.alias("_ks"))


@pytest.mark.parametrize("k,w", [(3, 4), (4, 4), (3, 8)])
def test_winnow_keys_kernel_matches_expression(spark, k, w):  # noqa: F811
    from goka_spark.functions import dedup as D

    docs = [
        (0, None),
        (1, ""),
        (2, "one"),
        (3, "a a a a a a a a a a"),          # min ties -> rightmost
        (4, "x  y\tz\nw  v u t s r q p o"),  # mixed whitespace
        (5, "the quick brown fox jumps over the lazy dog again and"
            " again the quick brown fox jumps over the lazy dog"),
        (6, "solo pair"),
        (7, " ".join(f"w{i % 7}" for i in range(60))),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    old = {r["doc_id"]: (r["_L"], r["_ks"]) for r in
           _old_winnow_keys(df, "doc_id", "text", k, w).collect()}
    new = {r["doc_id"]: (r["_L"], r["_ks"]) for r in
           D._winnow_keys(df, "doc_id", "text", k, w).collect()}
    assert new == old


# ------------------------------------- skipgram pairs / fingerprint


ADVERSARIAL_DOCS = [
    (0, None),
    (1, ""),
    (2, "one"),
    (3, "a b a b a b a"),
    (4, "x  y\tz\nw  v"),
    (5, "zz aa zz aa mm"),
    (6, "short"),
    (7, " ".join(f"w{i % 5}" for i in range(30))),
]


def test_skipgram_pmi_matches_expression(spark):  # noqa: F811
    from goka_spark.functions.text import skipgram_pmi_topk, words

    df = spark.createDataFrame(ADVERSARIAL_DOCS,
                               "doc_id long, text string")

    # the pre-r14 zip_with formulation, verbatim
    window, min_count, k = 4, 2, 50
    ws = words(F.col("text"))

    def po(o):
        ln = F.greatest(F.size(ws) - F.lit(o), F.lit(0))
        return F.zip_with(
            F.slice(ws, 1, ln), F.slice(ws, o + 1, ln),
            lambda x, y: F.concat_ws(" ", F.least(x, y),
                                     F.greatest(x, y)))

    prs = F.flatten(F.array(*[po(o) for o in range(1, window + 1)]))
    pc = (df.select(F.explode(prs).alias("pr"))
          .groupBy("pr").agg(F.count("*").alias("cnt_ab")))
    t_tot = pc.agg(F.sum("cnt_ab").cast("long").alias("_t"))
    uni = (df.select(F.explode(ws).alias("w"))
           .groupBy("w").agg(F.count("*").alias("c")))
    n_tot = uni.agg(F.sum("c").cast("long").alias("_n"))
    old_pairs = (pc.filter(F.col("cnt_ab") >= min_count)
                 .select(F.split("pr", " ").getItem(0).alias("w1"),
                         F.split("pr", " ").getItem(1).alias("w2"),
                         F.col("cnt_ab").cast("long"))
                 .join(uni.select(F.col("w").alias("w1"),
                                  F.col("c").cast("long").alias("_ca")),
                       "w1")
                 .join(uni.select(F.col("w").alias("w2"),
                                  F.col("c").cast("long").alias("_cb")),
                       "w2")
                 .crossJoin(F.broadcast(n_tot))
                 .crossJoin(F.broadcast(t_tot)))
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    x = ((d("cnt_ab") * d("_n") * d("_n"))
         / (d("_t") * d("_ca") * d("_cb")))
    old = (old_pairs.select(
        "w1", "w2", "cnt_ab",
        F.floor(F.log(x) * 1000000 + F.lit(0.5)).cast("long")
        .alias("pmi_e6"))
        .orderBy(F.col("pmi_e6").desc(), "w1", "w2")
        .limit(k)).collect()
    new = skipgram_pmi_topk(df, "doc_id", "text", window=window,
                            min_count=min_count, k=k).collect()
    assert [tuple(r) for r in new] == [tuple(r) for r in old]


def test_doc_fingerprint_kernel_matches_expression(spark):  # noqa: F811
    from goka_spark.functions.text import fingerprint

    rows = ADVERSARIAL_DOCS + [(8, "exactly8"), (9, "exactly8c"),
                               (10, "ünïcødé tëxt with ümläuts")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    old = {r["doc_id"]: r["fp"] for r in df.select(
        "doc_id", fingerprint(F.col("text")).alias("fp")).collect()}

    import hashlib
    for did, text in rows:
        if text is None:
            assert old[did] is None
            continue
        n = max(len(text) - 7, 1)
        got = min(hashlib.md5(text[i:i + 8].encode("utf-8")).hexdigest()
                  for i in range(n))
        assert got == old[did], did
