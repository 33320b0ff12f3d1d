"""Plan-shape tests: the 100 TB contract.  Correctness tests prove the
answer; these prove the *physical plan* scales — filters pushed to the
scan, columns pruned, small dims broadcast, aggregations partial."""

from goka_spark.plans import explain as X
from goka_spark.queries import analytics, core, llmdata


def test_q1_pushdown_and_pruning(spark, sf_dir):
    df = analytics.q1_pricing_summary(spark, sf_dir)
    pushed = " ".join(X.pushed_filters(df))
    assert "l_shipdate" in pushed, f"shipdate filter not pushed: {pushed}"
    schema = X.read_schemas(df)[0]
    # projection pruning: unused columns must not be read
    assert "l_partkey" not in schema and "l_suppkey" not in schema


def test_q6_selective_scan(spark, sf_dir):
    df = analytics.q6_forecast_revenue(spark, sf_dir)
    pushed = " ".join(X.pushed_filters(df))
    assert "l_discount" in pushed and "l_quantity" in pushed


def test_lookup_is_broadcast(spark, sf_dir):
    """ctx.Lookup must compile to BroadcastHashJoin (goka replicates
    lookup tables to every instance; we broadcast)."""
    df = core.stream_lookup_join(spark, sf_dir)
    assert X.has_broadcast_join(df)


def test_q5_broadcasts_dims(spark, sf_dir):
    df = analytics.q5_local_supplier(spark, sf_dir)
    assert X.has_broadcast_join(df)


def test_counter_has_partial_agg(spark, sf_dir):
    """The group-table fold must do map-side combine — at 100 TB the
    shuffle carries one partial row per (partition, key), not raw events."""
    df = core.proc_count_per_key(spark, sf_dir)
    assert X.has_partial_aggregation(df)


def test_counter_single_shuffle(spark, sf_dir):
    """Counter graph: exactly one exchange (on the group key)."""
    df = core.proc_count_per_key(spark, sf_dir)
    assert X.num_shuffles(df) <= 1, X.simple(df)


def test_view_point_get_prunes_scan(spark, sf_dir):
    """View.Get compiles to a key filter evaluated before the fold —
    the filter lands on the scan side of the aggregation."""
    df = core.view_point_get(spark, sf_dir)
    # key filter on a post-agg table cannot push into parquet, but the
    # plan must stay a single-stage filter over the agg, no extra join
    assert X.num_shuffles(df) <= 1


def test_as_of_join_single_shuffle(spark, sf_dir):
    """Union+window as-of: one hash exchange on the join key, one sort —
    no range-join explosion."""
    df = analytics.as_of_join_q(spark, sf_dir)
    assert X.num_shuffles(df) <= 2  # union inputs may each repartition


def test_cosine_topk_expr_broadcasts_queries(spark, sf_dir):
    from goka_spark.functions import similarity as S
    from goka_spark.queries.base import load
    from pyspark.sql import functions as F

    emb = load(spark, sf_dir, "embeddings")["embeddings"]
    q = emb.filter(F.col("vec_id") < 5)
    df = S.cosine_topk(emb, q, "vec_id", "embedding", k=5)
    assert "Broadcast" in X.simple(df)


def test_cosine_topk_arrow_no_corpus_shuffle(spark, sf_dir):
    """Arrow path: scoring is map-side (mapInPandas against the
    broadcast query matrix); only the ≤k-per-partition candidates
    shuffle for the final merge."""
    df = llmdata.embedding_cosine_topk(spark, sf_dir)
    plan = X.simple(df)
    assert "MapInPandas" in plan
    assert X.num_shuffles(df) <= 1


def test_token_count_stays_codegen(spark, sf_dir):
    """Text functions are pure Column exprs: whole-stage codegen, no
    Python eval in the plan."""
    plan = X.simple(llmdata.token_count(spark, sf_dir))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_q4_exists_is_semi_join(spark, sf_dir):
    """EXISTS compiles to a semi join with the date filter pushed to
    the orders scan — never a full join + distinct."""
    df = analytics.q4_order_priority(spark, sf_dir)
    plan = X.simple(df)
    assert "LeftSemi" in plan
    pushed = " ".join(X.pushed_filters(df))
    assert "o_orderdate" in pushed


def test_q16_not_in_is_broadcast_anti(spark, sf_dir):
    """NOT IN over the tiny blacklist must be a broadcast anti join,
    and the part dim a broadcast join — only the pair-dedup shuffles."""
    plan = X.simple(analytics.q16_supplier_count_by_part(spark, sf_dir))
    assert "LeftAnti" in plan and "BroadcastHashJoin" in plan


def test_q9_broadcasts_all_dims(spark, sf_dir):
    """part/supplier/nation ride broadcasts; the only hash exchanges
    are the orders join and the final (nation, year) aggregate."""
    df = analytics.q9_profit_by_nation_year(spark, sf_dir)
    assert X.has_broadcast_join(df)
    assert X.has_partial_aggregation(df)


def test_q11_threshold_is_single_row_broadcast(spark, sf_dir):
    """The scalar subquery joins back as a single-row broadcast
    nested loop, not a shuffle."""
    plan = X.simple(analytics.q11_important_parts(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan


def test_q13_left_join_preserves_partial_agg(spark, sf_dir):
    df = analytics.q13_order_count_distribution(spark, sf_dir)
    assert X.has_partial_aggregation(df)


def test_q21_single_lineitem_aggregate(spark, sf_dir):
    """The double-EXISTS is ONE per-order aggregate joined back to the
    late lineitems: supplier/nation dims broadcast, the orders filter
    reaches the scan, and the aggregate runs partial+final."""
    df = analytics.q21_waiting_suppliers(spark, sf_dir)
    plan = X.simple(df)
    assert X.has_broadcast_join(df)
    assert X.has_partial_aggregation(df)
    assert "CartesianProduct" not in plan
    pushed = " ".join(X.pushed_filters(df))
    assert "o_orderstatus" in pushed


def test_ngram_join_has_no_cartesian(spark, sf_dir):
    """The similarity self-join is an equi-join on the shingle key —
    the plan may never degrade to a cartesian/nested-loop product.
    Pins the KERNEL's plan (what a cluster runs at 100 TB); the
    registry query serves the same values from a session memo whose
    checkpoint hides the lineage."""
    from goka_spark.functions import dedup as D
    from goka_spark.queries.base import load

    docs = load(spark, sf_dir, "documents")["documents"]
    plan = X.simple(D.ngram_jaccard_pairs(docs, "doc_id", "text", n=3,
                                          threshold=0.05, max_df=50))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_decontaminate_broadcasts_benchmark(spark, sf_dir):
    """The benchmark shingle set (MBs) must ride a broadcast join —
    a shuffle join here would move the whole corpus posting list
    against a tiny build side.  Pins the KERNEL's plan (the registry
    query serves the memoized frame)."""
    from goka_spark.functions import dedup as D
    from goka_spark.queries.base import load
    from pyspark.sql import functions as F

    docs = load(spark, sf_dir, "documents")["documents"]
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    corp = docs.filter(F.col("doc_id") % 97 != 0)
    plan = X.simple(D.decontaminate(corp, bench, "doc_id", "text", n=3))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_dup_ngram_coverage_rides_span_memo(spark, sf_dir):
    """r15: the query serves the span family's positioned-postings
    session memo — the returned plan must contain NO shingle kernel
    (no Python eval node; both inputs are checkpointed RDD scans) and
    nothing may degrade to a cartesian product.  The standalone
    function (no memo injected) must still agree row-for-row."""
    df = llmdata.dup_ngram_coverage(spark, sf_dir)
    plan = X.simple(df)
    assert "CartesianProduct" not in plan
    assert "MapInPandas" not in plan and "ExistingRDD" in plan

    from goka_spark.functions import dedup as D
    from goka_spark.queries.base import load
    docs = load(spark, sf_dir, "documents")["documents"]
    standalone = D.dup_ngram_coverage(docs, "doc_id", "text",
                                      n=5, min_df=2)
    got = {tuple(r) for r in df.collect()}
    want = {tuple(r) for r in standalone.collect()}
    assert got == want


def test_event_rollup_is_single_expand_aggregate(spark, sf_dir):
    """ROLLUP compiles to one Expand + one partial/final hash-agg pair
    over a single scan — never one scan per grouping level."""
    from goka_spark.queries import analytics

    plan = X.simple(analytics.event_rollup(spark, sf_dir))
    assert plan.count("Expand") == 1
    assert plan.count("Scan parquet") == 1
    assert "partial_count" in X.formatted(analytics.event_rollup(spark, sf_dir))


def test_pq_rerank_join_no_cartesian(spark, sf_dir):
    """PQ ANN: the exact re-rank fetches candidate vectors via id
    equi-joins with the (tiny) query side broadcast — no cartesian or
    nested-loop fallback anywhere."""
    plan = X.simple(llmdata.embedding_pq_ann(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_tfidf_broadcasts_vocabulary(spark, sf_dir):
    """tf-idf: the vocabulary df table and the 1-row corpus count ride
    broadcasts — the (doc, term) stream itself is never re-shuffled by
    term for the join."""
    from goka_spark.queries import llmdata as L

    plan = X.simple(L.tfidf_keywords(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_interarrival_single_user_shuffle(spark, sf_dir):
    """lag + groupBy share the user partitioning: after the window's
    exchange on user_id the aggregate needs NO second exchange (the
    final agg exchange is elided by the existing clustering)."""
    from goka_spark.queries import analytics

    df = analytics.event_interarrival(spark, sf_dir)
    # exactly one exchange in the whole plan (the window's)
    assert X.num_shuffles(df) == 1, X.simple(df)


def test_dup_span_extract_reuses_postings_exchange(spark, sf_dir):
    """Span extraction: no cross product anywhere; since r15 the
    positioned postings and their df aggregate are SESSION MEMOS
    (checkpointed once, shared with dup_span_remove), so the query
    plan itself contains no shingle kernel at all — both join arms
    read the materialized frames (the stronger form of the old
    ReusedExchange pin, which asserted the kernel ran once per
    query)."""
    df = llmdata.dup_span_extract(spark, sf_dir)
    plan = X.simple(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the positional shingle kernel must NOT run inside this plan —
    # it lives in the memoized checkpoint build
    assert "MapInPandas" not in plan
    assert "Scan ExistingRDD" in plan


def test_dsir_log_ratio_table_is_broadcast(spark, sf_dir):
    """DSIR: the per-bucket log-ratio table (≤ n_buckets rows) rides a
    broadcast back onto the per-doc features — the corpus-side
    features are never shuffled a second time for the join."""
    df = llmdata.corpus_importance_weights(spark, sf_dir)
    assert X.has_broadcast_join(df), X.simple(df)
    assert "CartesianProduct" not in X.simple(df)


def test_corpus_split_zero_shuffle(spark, sf_dir):
    """Split assignment is a pure scan-stage expression — any
    Exchange would mean the policy picked up a shuffle it never
    needs (at 100 TB that's the whole corpus moving for a filter)."""
    plan = X.simple(llmdata.corpus_split(spark, sf_dir))
    assert "Exchange" not in plan, plan


def test_domain_mix_broadcasts_rates(spark, sf_dir):
    """The per-domain rates table (one row per domain) must ride a
    broadcast join onto the corpus scan; the only shuffle allowed is
    the per-domain count aggregate."""
    plan = X.simple(llmdata.corpus_domain_mix(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_bloom_decontaminate_broadcasts_bits(spark, sf_dir):
    """The set-bit position table (<= 2^17 longs) must broadcast —
    that constant-size build side is the entire point of the Bloom
    variant at benchmark scales where the gram strings wouldn't fit."""
    plan = X.simple(llmdata.bloom_decontaminate(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_incremental_dedup_no_cartesian(spark, sf_dir):
    """Batch-vs-corpus probes are hash equi-joins on md5/band keys;
    no pairing stage may degrade to a cartesian product."""
    plan = X.simple(llmdata.dedup_incremental(spark, sf_dir))
    assert "CartesianProduct" not in plan


def test_weighted_sample_is_topk_not_global_sort(spark, sf_dir):
    """Efraimidis-Spirakis selection must compile to
    TakeOrderedAndProject (per-partition partial top-k, k-row driver
    merge) — a global Sort would shuffle the whole corpus for 100
    rows."""
    plan = X.simple(llmdata.corpus_weighted_sample(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan


def test_decontaminate_spans_broadcasts_benchmark(spark, sf_dir):
    """The benchmark shingle set rides a broadcast; the corpus-side
    postings never shuffle for the candidate join (the only exchange
    is the per-doc span window)."""
    df = llmdata.decontaminate_spans(spark, sf_dir)
    assert X.has_broadcast_join(df)


def test_containment_no_cartesian_single_pair_agg(spark, sf_dir):
    """Containment shares the Jaccard candidate core: an equi-join on
    the shingle, never a cartesian pairing."""
    plan = X.simple(llmdata.ngram_containment_pairs(spark, sf_dir))
    assert "CartesianProduct" not in plan


# ------------------------------------------------- round-6 operators

def test_vocab_coverage_topk_and_broadcast(spark, sf_dir):
    """Vocab is TakeOrderedAndProject (never a global sort) and its
    membership join broadcasts."""
    from goka_spark.queries.llmdata import vocab_coverage
    df = vocab_coverage(spark, sf_dir)
    plan = X.simple(df)
    assert "TakeOrderedAndProject" in plan
    assert X.has_broadcast_join(df)
    assert "CartesianProduct" not in plan


def test_nb_classifier_broadcasts_model(spark, sf_dir):
    """The coefficient table joins broadcast; no corpus-side cartesian
    beyond the 1-row prior/totals broadcasts."""
    from goka_spark.queries.llmdata import nb_quality_classify
    df = nb_quality_classify(spark, sf_dir)
    plan = X.simple(df)
    assert X.has_broadcast_join(df)
    assert "CartesianProduct" not in plan


def test_perplexity_buckets_broadcast_thresholds(spark, sf_dir):
    """Pins the KERNEL's plan (the registry query serves the memoized
    frame, whose checkpoint hides the lineage)."""
    from goka_spark.functions import text as T
    from goka_spark.queries.base import load

    docs = load(spark, sf_dir, "documents")["documents"]
    plan = X.simple(T.perplexity_buckets(docs, "doc_id", "text"))
    # the 1-row tercile frame rides a broadcast nested-loop join;
    # bucket assignment itself is scan-stage
    assert "Broadcast" in plan
    assert "CartesianProduct" not in plan


def test_knn_graph_no_cartesian(spark, sf_dir):
    """Neighbor candidates come from the cell equi-join of the codes
    table — never an n x n cartesian."""
    from goka_spark.queries.base import load
    from goka_spark.queries.llmdata import _ann_index

    from goka_spark.functions import ann_index as A
    emb = load(spark, sf_dir, "embeddings")["embeddings"]
    idx = _ann_index(spark, sf_dir, emb)
    df = A.knn_graph(idx, k=3)
    plan = X.simple(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_gopher_repetition_map_only(spark, sf_dir):
    """r14: the repetition family is a pure per-document function, so
    the plan must be a single Arrow-batched map over the scan — ZERO
    exchanges, zero joins (the pre-r14 pure-SQL plan shuffled the
    token stream for a window-lead pass plus a (doc, n, gram) agg and
    five doc-keyed joins)."""
    from goka_spark.queries.llmdata import gopher_repetition
    df = gopher_repetition(spark, sf_dir)
    plan = X.simple(df)
    assert X.num_shuffles(df) == 0, plan
    assert "Join" not in plan
    assert "MapInPandas" in plan or "ArrowEvalPython" in plan
    assert "CartesianProduct" not in plan


def test_ngram_novelty_reuses_postings_exchange(spark, sf_dir):
    """r7 (re-pinned r14): the min-per-gram aggregate and the join
    probe side must share ONE materialized postings frame — the
    shingle kernel is the dominant cost and must never run twice.
    r7 enforced this via an in-plan repartition('sh') whose Exchange
    AQE reused; r14 moved the materialization up a level to the
    session postings memo (localCheckpoint), so both consumers now
    scan the SAME checkpointed RDD and the plan contains no shingle
    kernel at all.  Accept either shape, reject any plan that would
    recompute the kernel per consumer."""
    df = llmdata.ngram_novelty(spark, sf_dir)
    assert "CartesianProduct" not in X.simple(df)
    df.collect()
    executed = df._jdf.queryExecution().executedPlan().toString()
    if "ReusedExchange" not in executed:
        # memoized shape: both sides read the checkpointed postings
        # RDD; the shingle MapInPandas kernel must not appear
        assert executed.count("Scan ExistingRDD") >= 2, executed
        assert "MapInPandas" not in executed, executed


def test_gopher_repetition_no_postings_sized_join(spark, sf_dir):
    """r7 regression pin for the 64x broadcast OOM, carried to the
    r14 map-only kernel: no join may EVER touch a postings-sized
    frame — trivially satisfied now because the optimized plan
    contains no joins at all (per-doc dicts replaced the gram agg)."""
    from goka_spark.queries.llmdata import gopher_repetition
    df = gopher_repetition(spark, sf_dir)
    logical = df._jdf.queryExecution().optimizedPlan().toString()
    assert logical.count("Join ") == 0, logical


def test_span_corruption_is_scan_stage_only(spark, sf_dir):
    """The T5 mask plan is pure Column work: ZERO exchanges — at
    100 TB it rides the ingest scan for free."""
    df = llmdata.span_corruption_masks(spark, sf_dir)
    assert X.num_shuffles(df) == 0, X.simple(df)
    schema = X.read_schemas(df)[0]
    assert "n_chars" not in schema       # column pruning holds


def test_key_skew_report_partial_agg_no_global_sort(spark, sf_dir):
    """Hot-key report: map-side-combined user agg and a TakeOrdered,
    never a global Sort node."""
    df = analytics.key_skew_report(spark, sf_dir)
    assert X.has_partial_aggregation(df)
    plan = X.simple(df)
    assert "TakeOrderedAndProject" in plan


def test_winnow_overlap_no_rehash_in_filters(spark, sf_dir):
    """Regression guard for the InferFiltersFromGenerate pathology:
    no Filter node may contain the md5 gram-hash expression (an
    inferred size(keys) > 0 pushed below the projections re-hashes
    every doc O(L²) — measured 74 s vs 3 s at sf0.001)."""
    df = llmdata.winnow_overlap_pairs(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if line.strip().startswith(("Filter", "*(") ) and "Filter" in line:
            assert "md5" not in line, line[:300]


def test_winnow_overlap_detects_planted_quotation(spark):
    """A 12-word passage quoted inside an unrelated doc must pair
    (the w+k-1 guarantee), disjoint docs must not."""
    from goka_spark.functions import dedup as D
    quote = " ".join(f"q{i}" for i in range(12))
    docs = spark.createDataFrame(
        [(1, quote + " tail1 tail2 tail3 tail4 tail5"),
         (2, "lead1 lead2 lead3 " + quote),
         (3, " ".join(f"z{i}" for i in range(20)))],
        "doc_id long, text string")
    out = {(r["id_a"], r["id_b"]): r["shared_fp"] for r in
           D.winnow_overlap_pairs(docs, "doc_id", "text").collect()}
    assert (1, 2) in out
    assert all(p == (1, 2) for p in out)


def test_doc_chunk_zero_shuffle(spark, sf_dir):
    """Chunking is pure scan-stage work — zero exchanges (the
    span_corruption_masks contract): at 100 TB it rides the ingest
    scan for free."""
    from goka_spark.functions.corpus import doc_chunk
    from goka_spark.queries.base import load

    docs = load(spark, sf_dir, "documents")["documents"]
    df = doc_chunk(docs, "doc_id", "text")
    assert X.num_shuffles(df) == 0, X.simple(df)


def test_release_diff_carries_hashes_not_text(spark, sf_dir):
    """The diff join input is (id, md5) — the text column must not
    cross the exchange (the 64-bytes-per-doc claim)."""
    from goka_spark.functions.corpus import release_diff
    from goka_spark.queries.base import load

    docs = load(spark, sf_dir, "documents")["documents"]
    df = release_diff(docs, docs, "doc_id", "text")
    plan = X.simple(df)
    ex = [l for l in plan.splitlines() if "Exchange" in l]
    assert ex and all("text" not in l for l in ex), plan


def test_matryoshka_one_scoring_scan(spark, sf_dir):
    """The corpus-scoring join is a broadcast of the ≤ n_queries side
    (BroadcastNestedLoopJoin over the != predicate is fine — the
    build side is 20 rows), the top-k is a WindowGroupLimit partial
    top-k, and the scoring scan runs ONCE: the downstream recall
    arithmetic reads the checkpointed 400-row top frame, not the
    corpus."""
    from goka_spark.functions.similarity import matryoshka_recall
    from goka_spark.queries.base import load

    emb = load(spark, sf_dir, "embeddings")["embeddings"]
    df = matryoshka_recall(emb, "vec_id", "embedding")
    plan = X.simple(df)
    assert "CartesianProduct" not in plan
    # post-checkpoint plan must not rescan/rescore the corpus
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "aggregate(zip_with" not in plan, plan


def test_ohlc_bars_single_shuffle_partial_agg(spark, sf_dir):
    """OHLC is ONE windowed hash-agg: a single exchange on
    (window, event_type) with map-side combine."""
    df = analytics.ohlc_bars(spark, sf_dir)
    assert X.num_shuffles(df) <= 1, X.simple(df)
    assert X.has_partial_aggregation(df)


def test_time_weighted_avg_single_shuffle(spark, sf_dir):
    """TWA = one per-user window + one agg on the same key — the
    window's exchange is the only one (no self-join for the last
    observation)."""
    df = analytics.time_weighted_avg(spark, sf_dir)
    assert X.num_shuffles(df) <= 1, X.simple(df)


def test_boilerplate_strip_broadcasts_source_counts(spark, sf_dir):
    """The sources-sized doc-count table must broadcast onto the
    per-(source, line) frequency table, never shuffle-join it."""
    df = llmdata.boilerplate_strip(spark, sf_dir)
    assert X.has_broadcast_join(df)


def test_char_ngram_lang_id_broadcasts_profile(spark, sf_dir):
    """The langs x 20-gram profile is broadcast onto the doc-gram
    postings (a shuffle join would move the whole postings table)."""
    df = llmdata.char_ngram_lang_id(spark, sf_dir)
    assert X.has_broadcast_join(df)


def test_url_normalize_is_scan_only(spark, sf_dir):
    """The canonicalizer is pure scan-stage Columns: no exchange, no
    UDF — the whole op rides the parquet scan."""
    df = llmdata.url_normalize(spark, sf_dir)
    plan = X.simple(df)
    assert X.num_shuffles(df) == 0, plan
    assert "pythonUDF" not in plan and "BatchEvalPython" not in plan


def test_host_cap_sample_single_shuffle(spark, sf_dir):
    """The per-host cap is ONE exchange (the row_number window's) on
    the canonical host."""
    df = llmdata.host_cap_sample(spark, sf_dir)
    assert X.num_shuffles(df) <= 1, X.simple(df)


def test_max_drawdown_single_shuffle(spark, sf_dir):
    """Prefix-max window + per-user agg share the user_id hash
    partitioning: one exchange total (the TWA discipline)."""
    df = analytics.max_drawdown(spark, sf_dir)
    assert X.num_shuffles(df) <= 1, X.simple(df)


def test_stickiness_hll_no_python_udf(spark, sf_dir):
    """The sketch path is pure Column algebra (md5/conv/bin): no
    Python UDF, no cartesian — the register explode is the only
    fanout and it is bounded by 30 x 256 rows per day."""
    df = llmdata.stickiness_hll(spark, sf_dir)
    plan = X.simple(df)
    assert "pythonUDF" not in plan and "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_user_active_time_single_shuffle(spark, sf_dir):
    """Lag window + (user, session) agg + user agg share the user_id
    partitioning: one exchange total."""
    df = analytics.user_active_time(spark, sf_dir)
    assert X.num_shuffles(df) <= 1, X.simple(df)


def test_rfm_segments_broadcasts_corpus_max(spark, sf_dir):
    """The corpus max ts joins as the BROADCAST build side of a
    one-row nested-loop (the scalar-join house pattern) — never a
    shuffled CartesianProduct."""
    df = analytics.rfm_segments(spark, sf_dir)
    plan = X.simple(df)
    assert "BroadcastNestedLoopJoin BuildRight" in plan, plan
    assert "CartesianProduct" not in plan


def test_edit_distance_levenshtein_evaluated_once_and_wide(spark, sf_dir):
    """Two optimizer pathologies this plan must never regress to:
    the `_d >= 0` filter merging into the join condition and
    predicate pushdown re-substituting the `_d` alias — both
    re-evaluate Levenshtein per row — and the byte-tiny pair frame
    being scored on AQE-coalesced partitions.  The scoring sits
    BELOW the lazy localCheckpoint (materialized once, on the
    explicit fan-out): the post-checkpoint plan must contain NO
    levenshtein call at all, just the RDD barrier."""
    df = llmdata.edit_distance_pairs(spark, sf_dir)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert plan.lower().count("levenshtein") == 0, plan
    assert "LogicalRDD" in plan, plan


def test_freq_window_guard_caps_unpartitioned_window(spark, sf_dir):
    """r9 verdict ask #4: the inequality kernels (B58/B59/B81) run
    an UNPARTITIONED cumulative window over the count-frequency
    frame — safe only because that frame is distinct-levels-sized.
    The guard must (a) pass values through untouched under the
    bound, (b) fail loudly the moment the frame exceeds it, so the
    kernel can't silently be reused on a high-cardinality column."""
    import pytest
    from pyspark.sql import functions as F

    from goka_spark.queries.analytics import _guard_freq_window

    freq = spark.range(10).select(F.col("id").alias("cnt"),
                                  F.lit(3).alias("u"))
    ok = _guard_freq_window(freq, "cnt", bound=10)
    assert [r.cnt for r in ok.orderBy("cnt").collect()] == list(range(10))
    over = _guard_freq_window(freq, "cnt", bound=5)
    with pytest.raises(Exception, match="FREQ_WINDOW_BOUND"):
        over.collect()


def test_activity_gini_guard_adds_no_exchange(spark, sf_dir):
    """The guard piggybacks row_number on the kernel's own window
    partition/order — the plan must keep exactly the kernel's
    exchanges (events→per_user, per_user→freq, freq→single) and not
    add one."""
    df = analytics.activity_gini(spark, sf_dir)
    assert X.num_shuffles(df) <= 3, X.simple(df)


def test_front_queries_have_no_cartesian_products(spark, sf_dir):
    """Blanket 100 TB guard over the r10 certification front: none of
    the newly certified queries may plan a CartesianProduct — every
    pairing must come from an equi-join, a broadcast, or a postings
    join.  (Exchange counts vary by design — iterative CC audits
    legitimately plan dozens — but a cartesian is never right.)"""
    from goka_spark.queries import all_queries

    qs = all_queries()
    for key in list(qs)[:50]:
        plan = X.simple(qs[key](spark, sf_dir))
        assert "CartesianProduct" not in plan, key


def test_simhash_histogram_no_distinct_exchange(spark, sf_dir):
    """r12: the first-matching-band filter must keep the histogram's
    dedup OUT of the plan — no HashAggregate over raw candidate pairs
    for uniqueness (the old .distinct()), only the band equi-join and
    the tiny hamming-count agg.  The plan should show exactly the
    join exchanges plus ONE aggregation pair (partial+final on
    hamming)."""
    from goka_spark.queries.llmdata import simhash_hamming_histogram

    df = simhash_hamming_histogram(spark, sf_dir)
    plan = X.simple(df)
    # the uniqueness distinct compiled to an extra exchange on
    # (id_a, id_b, hamming); with the scan-stage filter the only
    # aggregate keys left are the histogram's
    assert "id_a" not in plan.lower(), plan


def test_source_overlap_reuses_memoized_grams(spark, sf_dir):
    """r12: source_overlap_matrix must read the session-memoized
    (source, gram) projection — the plan over the memo shows a
    checkpoint scan, not a fresh corpus shingle explode."""
    from goka_spark.queries.llmdata import (_source_grams,
                                            source_overlap_matrix)
    from goka_spark.queries.base import load

    docs = load(spark, sf_dir, "documents")["documents"]
    _source_grams(spark, docs, sf_dir).count()  # warm the memo
    df = source_overlap_matrix(spark, sf_dir)
    plan = X.simple(df)
    assert "Generate explode" not in plan, plan


def test_new_b_keys_partial_agg_and_broadcast(spark, sf_dir):
    """r12 B-side additions keep the house rules: fan-out histogram
    aggregates partially (map-side combine before the shuffle) and
    nation_ship_latency broadcasts its dims into the fact join."""
    from goka_spark.queries.analytics import (nation_ship_latency,
                                              order_fanout_histogram)

    assert X.has_partial_aggregation(order_fanout_histogram(spark,
                                                            sf_dir))
    assert X.has_broadcast_join(nation_ship_latency(spark, sf_dir))


def test_paragraph_dedup_partial_agg(spark, sf_dir):
    """The CCNet paragraph frequency count must combine map-side —
    at 100 TB the shuffle carries (hash, partial count), never raw
    paragraphs."""
    from goka_spark.queries.llmdata import ccnet_paragraph_dedup

    df = ccnet_paragraph_dedup(spark, sf_dir)
    assert X.has_partial_aggregation(df)


def test_value_pareto_no_single_task_type_sort(spark, sf_dir):
    """r13 re-plan (VERDICT r12 finding #1) + r13 ADVICE barrier: the
    per-type Pareto rank must never funnel a whole event type through
    one window task, and the range-partitioned frame both consumers
    read must be PINNED (localCheckpoint) so the pstats offsets and
    the staged rank can never see different partition assignments.
    The range exchange lives in the pre-barrier lineage
    (_pareto_ranked_part); the final plan scans the checkpointed RDD
    and runs every v-DESC ranking window partitioned by
    (_pid, event_type) — never by event_type alone."""
    import re

    from goka_spark.queries.analytics import (_pareto_ranked_part,
                                              value_pareto_by_type)

    # phase 1: the pre-barrier lineage carries the range exchange on
    # the full rank key
    pre = (_pareto_ranked_part(spark, sf_dir, pin=False)
           ._jdf.queryExecution().toString().lower())
    assert "rangepartitioning" in pre, pre

    # phase 2: the final plan reads the barrier (ExistingRDD scan —
    # the exchange can no longer be recomputed per consumer) ...
    df = value_pareto_by_type(spark, sf_dir)
    plan = X.formatted(df)
    assert "existingrdd" in plan.lower(), plan
    # ... and every window that orders by the value column descending
    # (the actual ranking work) must carry _pid in its partition
    # spec; the only event_type-only window allowed is the offset
    # pass over the partition-count-sized pstats frame (no DESC
    # ordering there)
    for spec in re.findall(r"windowspecdefinition\(([^)]*)", plan):
        if "DESC" in spec:
            assert "_pid" in spec, spec


def test_sf_proportional_dims_not_hinted(spark, sf_dir):
    """r13 (VERDICT r12 finding #2): supplier and customer grow with
    the corpus (TPC-H: 15M customers/TB), so they must never carry a
    forced broadcast hint — a hint overrides AQE and OOMs every
    executor at 100 TB.  The tiny bounded dims (nation; the
    years-sized yt frame; the FILTERED part slice) keep theirs.  At
    test SFs the planner still picks a broadcast join on its own via
    file-size stats — both facts asserted here."""
    from goka_spark.queries.analytics import (mktsegment_revenue_share,
                                              nation_ship_latency,
                                              q9_profit_by_nation_year)

    # (query, expected hint count = only the bounded-dim hints)
    for fn, hints in ((nation_ship_latency, 1),        # nation
                      (mktsegment_revenue_share, 1),   # yt (years)
                      (q9_profit_by_nation_year, 2)):  # part-slice, nation
        df = fn(spark, sf_dir)
        ana = df._jdf.queryExecution().analyzed().toString()
        assert ana.count("ResolvedHint") == hints, (fn.__name__, ana)
        # the un-hinted SF-proportional dim still broadcasts at this
        # SF — chosen by the planner's size stats, not forced
        assert X.has_broadcast_join(df), fn.__name__


def test_r13_paragraph_family_plan_shapes(spark, sf_dir):
    """r13 additions keep the house rules: the paragraph savings
    report aggregates partially (the shuffle carries (hash, partial
    count), never raw paragraphs), and neither sketch-pair miner
    contains a cartesian product — candidates always flow through an
    equi-join on band/gram keys."""
    from goka_spark.queries.llmdata import (longest_shared_run_pairs,
                                            paragraph_minhash_pairs,
                                            source_paragraph_savings)

    assert X.has_partial_aggregation(
        source_paragraph_savings(spark, sf_dir))
    for fn in (paragraph_minhash_pairs, longest_shared_run_pairs):
        plan = X.simple(fn(spark, sf_dir))
        assert "CartesianProduct" not in plan, (fn.__name__, plan)


def test_r13_sweeps_partial_agg(spark, sf_dir):
    """The two sketch-calibration sweeps are bounded hash-aggs (≤ m
    rows / depth·width cells) with map-side combine — the mergeable-
    sketch contract their docstrings claim."""
    from goka_spark.queries.llmdata import (cms_width_sweep,
                                            hll_register_sweep)

    assert X.has_partial_aggregation(hll_register_sweep(spark, sf_dir))
    assert X.has_partial_aggregation(cms_width_sweep(spark, sf_dir))


def test_watermark_sweep_two_pass_prefix_max(spark, sf_dir):
    """B100's global running prefix-max must be the two-pass
    range-partitioned kernel: the staged frame reads a pinned
    checkpoint (ExistingRDD — one layout for both passes), and every
    window ordered by the arrival column (event_id) is partitioned
    by _pid — never a global single-task window over the fact."""
    import re

    from goka_spark.queries.analytics import watermark_drop_sweep

    plan = X.formatted(watermark_drop_sweep(spark, sf_dir))
    assert "existingrdd" in plan.lower(), plan
    for spec in re.findall(r"windowspecdefinition\(([^)]*)", plan):
        if "event_id" in spec:
            assert "_pid" in spec, spec


def test_nation_hhi_no_supplier_window(spark, sf_dir):
    """B97's per-nation totals must come from a groupBy + broadcast
    back (the B89 pattern), never a Window.partitionBy(nation) over
    the supplier-level frame — suppliers are SF-proportional, and a
    per-nation window is a single sort task per nation at 100 TB."""
    from goka_spark.queries.analytics import nation_supplier_hhi

    df = nation_supplier_hhi(spark, sf_dir)
    plan = X.formatted(df)
    assert "windowspecdefinition" not in plan.lower(), plan
    assert X.has_broadcast_join(df)


def test_bpe_word_tokens_single_arrow_map(spark, sf_dir):
    """The BPE word→tokens table is ONE Arrow map over the
    vocabulary-sized word dict (r14): no per-merge JVM fold chain and
    no localCheckpoint barriers — the old plan carried one plan node
    per merge plus an ExistingRDD scan every 4 merges (12 eager
    materialization jobs in the 48-merge scale mode)."""
    from goka_spark.queries.llmdata import bpe_token_count

    df = bpe_token_count(spark, sf_dir)
    plan = X.simple(df)
    assert "MapInPandas" in plan, plan
    # localCheckpoint would surface as an ExistingRDD scan
    assert "ExistingRDD" not in plan, plan


def test_nb_features_single_kernel_pass(spark, sf_dir):
    """r14: nb_classify / dsir_importance materialize the hashed-ngram
    feature frame ONCE (localCheckpoint barrier).  Without it the
    consumers reference the frame under different pushed-down
    predicates, ReuseExchange cannot unify the subtrees, and the
    executed plan ran the featurization kernel + corpus scan 4x (NB)
    / 6x (DSIR) per call.  The barrier surfaces as ExistingRDD scans;
    the kernel itself must no longer appear in the query plan."""
    for fn in (llmdata.nb_quality_classify,
               llmdata.corpus_importance_weights):
        df = fn(spark, sf_dir)
        plan = X.simple(df)
        assert "MapInPandas" not in plan, plan
        assert "ExistingRDD" in plan, plan
