"""Property tests for the round-13 kernels: random inputs,
independent pure-Python references.

- longest shared run: a planted run of random length L between docs
  built from DISJOINT vocabularies must come back as exactly L
- session-count identity: segmenting each user's stream at gap G in
  python equals the closed form (users + gaps-over-G) the B93 sweep
  aggregates
- disorder audit: per-user-monotone streams report zero disorder; a
  python running-max simulation matches share and max jump on random
  streams
- HLL merge: register-wise MAX over per-source registers equals the
  registers built from the union (the C205 rollup algebra) on random
  assignments
"""

import random

from pyspark.sql import functions as F


def test_longest_shared_run_recovers_planted_length(spark):
    """Docs share ONLY the planted run (disjoint filler vocabularies)
    → longest_run_words == L exactly, for random L ∈ [7, 14]."""
    rng = random.Random(13)
    rows = []
    wants = {}
    did = 0
    for trial in range(4):
        L = rng.randint(7, 14)
        run = " ".join(f"shared{trial}x{i}" for i in range(L))
        fa = " ".join(f"a{trial}w{i}" for i in range(rng.randint(4, 9)))
        fb = " ".join(f"b{trial}w{i}" for i in range(rng.randint(4, 9)))
        fa2 = " ".join(f"c{trial}w{i}" for i in range(rng.randint(4, 9)))
        fb2 = " ".join(f"d{trial}w{i}" for i in range(rng.randint(4, 9)))
        rows.append((did, f"{fa} {run} {fa2}"))
        rows.append((did + 1, f"{fb} {run} {fb2}"))
        wants[(did, did + 1)] = L
        did += 2
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    from goka_spark.functions import dedup as D
    cand = D.winnow_overlap_pairs(docs, "doc_id", "text")
    got_pairs = {(r.id_a, r.id_b) for r in cand.collect()}
    assert got_pairs == set(wants)  # each planted pair, nothing else

    # the C200 diagonal-islands algebra over the same gram law
    words = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    ng = F.greatest(F.size(words) - 2, F.lit(1))
    grams = F.transform(F.sequence(F.lit(1), ng),
                        lambda i: F.array_join(F.slice(words, i, 3), " "))
    pg = (docs.select("doc_id", F.size(words).alias("_L"),
                      F.posexplode(grams))
          .select("doc_id", "_L", F.col("pos").alias("_p"),
                  F.md5("col").alias("_gh")))
    from pyspark.sql import Window as W
    a = pg.select(F.col("doc_id").alias("id_a"),
                  F.col("_L").alias("_la"), F.col("_p").alias("_pa"),
                  "_gh")
    b = pg.select(F.col("doc_id").alias("_idb"),
                  F.col("_L").alias("_lb"), F.col("_p").alias("_pb"),
                  F.col("_gh").alias("_ghb"))
    m = (cand.select("id_a", "id_b").join(a, "id_a")
         .join(b, (F.col("id_b") == F.col("_idb"))
               & (F.col("_gh") == F.col("_ghb")))
         .select("id_a", "id_b", "_pa",
                 (F.col("_pa") - F.col("_pb")).alias("_diag"),
                 F.least("_la", "_lb").alias("_cap")))
    wrn = W.partitionBy("id_a", "id_b", "_diag").orderBy("_pa")
    isl = m.withColumn("_grp", F.col("_pa") - F.row_number().over(wrn))
    runs = (isl.groupBy("id_a", "id_b", "_cap", "_diag", "_grp")
            .agg(F.count("*").alias("_run")))
    out = (runs.groupBy("id_a", "id_b")
           .agg(F.max(F.least(F.col("_run") + 2, F.col("_cap")))
                .alias("lr")))
    got = {(r.id_a, r.id_b): r.lr for r in out.collect()}
    assert got == wants


def _python_sessions(events_by_user, gap_min):
    """Reference: segment each user's sorted minute-stamps at gap."""
    n_sessions = 0
    multi = 0
    for ts in events_by_user.values():
        s = 1
        for a, b in zip(ts, ts[1:]):
            if b - a > gap_min:
                s += 1
        n_sessions += s
        multi += 1 if s > 1 else 0
    return n_sessions, multi


def test_session_count_identity_random(spark):
    """sessions = users + gaps-over-G (the B93 closed form) equals a
    python segmentation on random streams, for every G."""
    rng = random.Random(31)
    rows, by_user = [], {}
    eid = 0
    for u in range(12):
        t = 0
        ts = []
        for _ in range(rng.randint(1, 20)):
            t += rng.randint(0, 120)
            ts.append(t)
            rows.append((eid, u, t))
            eid += 1
        by_user[u] = ts
    df = spark.createDataFrame(rows, "event_id long, user_id long, t long")
    from pyspark.sql import Window as W
    wo = W.partitionBy("user_id").orderBy("t", "event_id")
    g = (df.withColumn("_gap", F.col("t") - F.lag("t").over(wo))
         .groupBy("user_id")
         .agg(*[F.sum((F.col("_gap") > G).cast("long")).alias(f"o{G}")
                for G in (15, 30, 60)]))
    for G in (15, 30, 60):
        got_sessions, got_multi = (
            g.agg((F.count("*") + F.sum(f"o{G}")).alias("s"),
                  F.sum((F.col(f"o{G}") > 0).cast("long")).alias("m"))
            .collect()[0])
        want_sessions, want_multi = _python_sessions(by_user, G)
        assert (got_sessions, got_multi) == (want_sessions, want_multi), G


def test_disorder_running_max_matches_python(spark):
    """B95's per-user running-max jump law against a direct python
    simulation; a monotone stream reports zero disorder."""
    rng = random.Random(47)
    rows = []
    by_user = {}
    eid = 0
    for u in range(8):
        ts_list = []
        t = 1000
        for _ in range(rng.randint(2, 15)):
            # random walk that sometimes goes BACKWARD (disorder)
            t += rng.randint(-90, 150)
            ts_list.append(t)
            rows.append((eid, u, t))
            eid += 1
        by_user[u] = ts_list
    # plus one strictly monotone user
    for i in range(6):
        rows.append((eid, 99, 5000 + i * 10))
        eid += 1
    by_user[99] = [5000 + i * 10 for i in range(6)]

    df = spark.createDataFrame(rows, "event_id long, user_id long, t long")
    from pyspark.sql import Window as W
    wo = (W.partitionBy("user_id").orderBy("event_id")
          .rowsBetween(W.unboundedPreceding, -1))
    jump = F.max("t").over(wo) - F.col("t")
    per = (df.select("user_id", jump.alias("_j"))
           .groupBy("user_id")
           .agg(F.sum(F.coalesce((F.col("_j") > 0).cast("long"),
                                 F.lit(0))).alias("late"),
                F.max(F.coalesce(F.when(F.col("_j") > 0, F.col("_j")),
                                 F.lit(0))).alias("mx")))
    got = {r.user_id: (r.late, r.mx) for r in per.collect()}
    for u, ts_list in by_user.items():
        mx, late, wmx = None, 0, 0
        for i, t in enumerate(ts_list):
            if mx is not None and t < mx:
                late += 1
                wmx = max(wmx, mx - t)
            mx = t if mx is None else max(mx, t)
        assert got[u] == (late, wmx), u
    assert got[99] == (0, 0)


def test_hll_merge_equals_rebuild_random(spark):
    """Register-wise MAX over per-group registers == registers built
    from the union (C205's rollup algebra) on random assignments."""
    rng = random.Random(61)
    rows = [(rng.choice(["s1", "s2", "s3"]), f"item{rng.randint(0, 400)}")
            for _ in range(2000)]
    df = spark.createDataFrame(rows, "src string, item string")
    from goka_spark.functions import dedup as D
    per = D.hll_registers(df, ["src"], "item")
    merged = {(r.reg): r.mx for r in
              per.groupBy("reg").agg(F.max("r").alias("mx")).collect()}
    union = {(r.reg): r.r for r in
             D.hll_registers(df.select(F.lit("all").alias("g"), "item"),
                             ["g"], "item").collect()}
    assert merged == union
