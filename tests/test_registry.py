"""Registry consistency: every oracle belongs to a query; names unique."""

from goka_spark.queries import all_oracles, all_queries


def test_every_oracle_has_query():
    qs, os_ = all_queries(), all_oracles()
    assert set(os_) <= set(qs), set(os_) - set(qs)


def test_no_duplicate_keys_across_blocks():
    from goka_spark.queries import analytics, core, llmdata

    blocks = [core.QUERIES, analytics.QUERIES, llmdata.QUERIES]
    total = sum(len(b) for b in blocks)
    merged = {}
    for b in blocks:
        merged.update(b)
    assert len(merged) == total


def test_rows_only_set_is_intentional():
    qs, os_ = all_queries(), all_oracles()
    rows_only = set(qs) - set(os_)
    # embedding_lsh_ann left this set in round 4: its seeded planes
    # are embedded as SQL literals, making it hash-verified.
    # dedup_semantic joined it: SemDeDup's k-means cells are
    # engine-side (no SQL twin); its banding algebra is the C12
    # oracle's and its subset/representative contracts are pytest-pinned.
    assert rows_only == {
        "approx_distinct_users", "dedup_minhash_lsh", "dedup_simhash",
        "dedup_semantic", "embedding_ivf_ann", "embedding_pq_ann",
        "embedding_ivf_pq_ann", "emitter_roundtrip",
        "changelog_compaction",
    }
