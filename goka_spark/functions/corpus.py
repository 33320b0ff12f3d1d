"""Corpus management operators — split / mixture policies.

The training-data steps between filtering and training: carve the
corpus into reproducible train/validation/test partitions and reshape
the domain mixture toward target weights.  Both are HASH policies,
not RNG sampling: membership is a pure function of the document id
(md5 slot), so any engine — Spark at 100 TB, DuckDB auditing a
sample, a downstream loader double-checking — derives the identical
decision with no seed coordination and no shuffled state.

Reference parity: goka keys every decision off the message key
(partition = hash(key) % n, hashutils.go) — the same
"hash-of-id decides placement" contract applied to corpus curation.

Scale shape: everything here is a pure Column filter or a
few-rows-per-domain broadcast join on top of one scan — no windows,
no per-domain sorts, no driver loops; at 100 TB the only shuffle is
the per-domain count aggregate (map-side combined, one row per
domain).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.column import Column

#: slots per unit for split permilles / mixture rates
SPLIT_MOD = 1_000
RATE_MOD = 1_000_000


def hash_slot(id_col: Column, mod: int, salt: str = "") -> Column:
    """Deterministic slot in [0, mod): first 8 md5 hex chars of
    ``id || salt`` as an integer (bit-identical in DuckDB via
    CAST('0x' || substr(md5(...), 1, 8) AS BIGINT)).  A different
    ``salt`` re-rolls every assignment independently — e.g. the split
    salt must differ from any sampling salt or the two decisions
    correlate."""
    key = F.concat(id_col.cast("string"), F.lit(salt))
    return F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long") % mod


def hash_split(df: DataFrame, id_col: str,
               splits: list[tuple[str, int]] = (("train", 980),
                                                ("validation", 10),
                                                ("test", 10)),
               salt: str = "split-v1") -> DataFrame:
    """Assign every row to exactly one named split — disjoint and
    exhaustive by construction (consecutive slot ranges over one
    md5 slot in [0, 1000)).  ``splits`` are (name, permille) with
    permilles summing to 1000.

    Adding documents later never moves an existing document between
    splits (assignment depends only on the id), which is the property
    that keeps eval sets stable across corpus refreshes."""
    slot = hash_slot(F.col(id_col), SPLIT_MOD, salt)
    return df.select(F.col(id_col), _split_expr(slot, splits).alias("split"))


def _split_expr(slot: Column, splits) -> Column:
    """Consecutive permille slot ranges → split name (shared by
    :func:`hash_split` and :func:`leakage_safe_split`)."""
    splits = list(splits)
    total = sum(p for _, p in splits)
    if total != SPLIT_MOD:
        raise ValueError(f"split permilles must sum to {SPLIT_MOD}, got {total}")
    expr = None
    hi = 0
    for name, permille in splits:
        hi += permille
        expr = F.when(slot < hi, name) if expr is None else expr.when(slot < hi, name)
    return expr


def leakage_safe_split(df: DataFrame, id_col: str, cc: DataFrame,
                       splits: list[tuple[str, int]] = (("train", 980),
                                                        ("validation", 10),
                                                        ("test", 10)),
                       salt: str = "split-v1") -> DataFrame:
    """:func:`hash_split` with the anti-leakage guard every eval set
    needs: the membership slot is computed on the near-dup CLUSTER
    representative (the connected-components min-label from the dedup
    pair graph), so two near-duplicate documents can never straddle
    the train/eval boundary — the classic contamination path where a
    paraphrase of a test document sits in train.  Docs absent from
    the pair graph are their own singleton cluster (slot on their own
    id — identical to plain hash_split for the non-duplicated bulk).

    Returns ``(id, cluster_id, split)``.  Stability: adding documents
    never moves an existing SINGLETON between splits; a doc that
    gains a near-dup partner follows its cluster (that is the point).

    Scale shape: one left join against the (small) cc frame + a pure
    Column policy — no extra shuffle over hash_split itself."""
    labeled = (
        df.select(F.col(id_col))
        .join(cc.select(F.col("node").alias(id_col), "cluster_id"),
              id_col, "left")
        .withColumn("cluster_id",
                    F.coalesce(F.col("cluster_id"), F.col(id_col))))
    slot = hash_slot(F.col("cluster_id"), SPLIT_MOD, salt)
    return labeled.select(F.col(id_col), F.col("cluster_id"),
                          _split_expr(slot, splits).alias("split"))


def weighted_sample(df: DataFrame, id_col: str, weight_col: str,
                    k: int, salt: str = "ws-v1") -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement — k rows
    drawn with probability proportional to ``weight_col`` via the
    Efraimidis–Spirakis one-pass key method (Inf. Proc. Letters 2006):
    rank every row by ``ln(u) / w`` with ``u`` uniform in (0, 1] and
    keep the k largest.  Here ``u`` is NOT RNG — it derives from the
    md5 slot of ``id || salt`` — so the sample is a pure function of
    (ids, weights, salt): re-runs, other engines, and downstream
    auditors reproduce it exactly, the same contract as
    :func:`hash_split`.  A different ``salt`` redraws independently.

    Scale shape: one scan computing the key (pure Columns) feeding a
    ``TakeOrderedAndProject`` top-k (per-partition partial top-k, a
    k-row merge on the driver) — never a global sort, no shuffle of
    the corpus.  Rows with non-positive weight are excluded (they
    have zero selection probability by definition).

    Output: ``(id, weight, sample_key)`` with ``sample_key`` the
    (rounded) rank key — publishing it makes the draw auditable.
    """
    w = F.col(weight_col).cast("double")
    u = (hash_slot(F.col(id_col), 1 << 32, salt) + 1) / F.lit(float(1 << 32))
    key = F.log(u) / w
    return (df.filter(w > 0)
            .select(F.col(id_col), F.col(weight_col).alias("weight"),
                    key.alias("_key"))
            .orderBy(F.col("_key").desc(), F.col(id_col))
            .limit(k)
            .select(id_col, "weight",
                    F.round("_key", 6).alias("sample_key")))


def mixture_rates(df: DataFrame, domain_col: str,
                  weights: dict[str, int]) -> DataFrame:
    """Per-domain keep rates that reshape the corpus toward integer
    target ``weights`` (relative, any scale) while keeping the most
    data: the LIMITING domain — the one that runs out of documents
    first, min n_s/w_s — is kept whole and every other domain is
    down-sampled to match its ratio.

    All arithmetic is integer (floor division), so the policy is
    bit-reproducible in any engine: r_s = n_s*1e6 // w_s picks the
    limiting domain L (ties broken by domain name), targets are
    t_s = n_L * w_s // w_L, rates are rate_e6 = t_s*1e6 // n_s
    (>= 1e6 means keep-all; possible only on an r-tie, where the true
    ratios may order differently than their floors).

    Returns one row per domain: (domain, n_docs, target, rate_e6).
    Domains absent from ``weights`` get weight 0 → rate 0 (dropped).
    """
    w_rows = [(d, int(w)) for d, w in sorted(weights.items())]
    if any(w <= 0 for _, w in w_rows):
        raise ValueError("weights must be positive (omit a domain to drop it)")
    spark = df.sparkSession
    wdf = spark.createDataFrame(w_rows, f"{domain_col} string, w long")
    counts = df.groupBy(domain_col).agg(F.count("*").alias("n_docs"))
    j = counts.join(F.broadcast(wdf), domain_col, "left").fillna({"w": 0})
    return _rates_from_weighted_counts(j, domain_col)


def _rates_from_weighted_counts(j: DataFrame, domain_col: str) -> DataFrame:
    """(domain, n_docs, w) → (domain, n_docs, target, rate_e6): the
    limiting-domain / integer-rate arithmetic shared by
    :func:`mixture_rates` (literal weights) and
    :func:`temperature_rates` (count-derived weights)."""
    # `div` is Spark's integer division — exact on longs, unlike `/`
    # which routes through double and loses bits past 2^53 (real risk:
    # n_docs * 1e6 overflows double precision at ~1e9 docs/domain)
    scored = j.withColumn(
        "_r", F.when(F.col("w") > 0,
                     F.expr(f"(n_docs * {RATE_MOD}L) div w")))
    # limiting domain via a 1-row broadcast join (min_by with a
    # deterministic domain-name tiebreak), not a driver collect
    lim = (scored.filter(F.col("w") > 0)
           .select(F.min_by(
               F.struct(F.col("n_docs").alias("n_l"), F.col("w").alias("w_l")),
               F.struct(F.col("_r"), F.col(domain_col))).alias("_lim"))
           .select("_lim.n_l", "_lim.w_l"))
    return (scored.crossJoin(F.broadcast(lim))
            .withColumn("target", F.expr("(n_l * w) div w_l"))
            .withColumn("rate_e6",
                        F.when(F.col("n_docs") > 0,
                               F.expr(f"(target * {RATE_MOD}L) div n_docs")))
            .select(domain_col, "n_docs", "target", "rate_e6"))


def domain_mix(df: DataFrame, id_col: str, domain_col: str,
               weights: dict[str, int],
               salt: str = "mix-v1") -> DataFrame:
    """Apply :func:`mixture_rates` — keep a document iff its md5 slot
    falls under its domain's rate.  The realized mix is Binomial
    around the target (the hash is uniform); the POLICY (counts →
    rates → membership) is exact integer math end-to-end, which is
    what the oracle verifies.  One scan + one small aggregate + a
    broadcast join: no O(corpus) shuffle."""
    rates = mixture_rates(df, domain_col, weights)
    slot = hash_slot(F.col(id_col), RATE_MOD, salt)
    return (df.join(F.broadcast(rates), domain_col)
            .withColumn("_slot", slot)
            .filter(F.col("_slot") < F.col("rate_e6"))
            .select(F.col(id_col), F.col(domain_col), F.col("rate_e6")))


def _isqrt(x: Column) -> Column:
    """Exact integer sqrt: floor(sqrt(x)) on BIGINT with a ±1
    correction around the double estimate, so the result is
    bit-identical in any engine regardless of libm rounding (double
    sqrt of a ≤2^63 integer is off by at most one after floor)."""
    s0 = F.floor(F.sqrt(x.cast("double"))).cast("long")
    s1 = s0 - F.when(s0 * s0 > x, F.lit(1)).otherwise(F.lit(0))
    return s1 + F.when((s1 + 1) * (s1 + 1) <= x, F.lit(1)).otherwise(F.lit(0))


def temperature_rates(df: DataFrame, domain_col: str) -> DataFrame:
    """Per-domain keep rates for TEMPERATURE-smoothed sampling at
    α = 1/2 — the multilingual-pretraining mixture policy (weight a
    domain by n^α instead of n, α<1, so head domains shrink and tail
    domains keep relatively more; mBERT/XLM-era exponent-smoothed
    sampling).  α is fixed at 1/2 because it is the exponent that
    admits EXACT integer arithmetic: w_d = isqrt(n_d · 10^6)
    (= floor(√n_d · 1000) up to the integer-sqrt floor), computed
    in-plan with :func:`_isqrt` — no libm pow, no driver collect, and
    any engine reproduces the policy bit-for-bit.  Other exponents
    belong in :func:`mixture_rates` via driver-computed literal
    weights.

    The weights then flow through the same limiting-domain
    arithmetic as :func:`mixture_rates`: the domain that runs out of
    documents first under its weight is kept whole, every other
    down-samples to match.  Returns (domain, n_docs, target,
    rate_e6).  One count aggregate (one row per domain); n_d·10^6
    stays under 2^63 for up to ~9·10^12 docs per domain."""
    counts = df.groupBy(domain_col).agg(F.count("*").alias("n_docs"))
    j = counts.withColumn("w", _isqrt(F.col("n_docs") * RATE_MOD))
    return _rates_from_weighted_counts(j, domain_col)


def temperature_mix(df: DataFrame, id_col: str, domain_col: str,
                    salt: str = "tmix-v1") -> DataFrame:
    """Apply :func:`temperature_rates` — keep a document iff its md5
    slot falls under its domain's α=1/2 smoothed rate.  Same scan +
    tiny-aggregate + broadcast-join shape as :func:`domain_mix`."""
    rates = temperature_rates(df, domain_col)
    slot = hash_slot(F.col(id_col), RATE_MOD, salt)
    return (df.join(F.broadcast(rates), domain_col)
            .withColumn("_slot", slot)
            .filter(F.col("_slot") < F.col("rate_e6"))
            .select(F.col(id_col), F.col(domain_col), F.col("rate_e6")))


def shuffle_order(df: DataFrame, id_col: str, n_shards: int,
                  salt: str = "shuffle-v1") -> DataFrame:
    """Deterministic global training-order shuffle — the "randomize
    the corpus before the data loader reads it" step every
    pretraining run needs, as a pure hash policy instead of an RNG:
    shard = md5-slot of the id, position-within-shard = rank of the
    full md5 key.  Any engine derives the identical order from
    (ids, salt) alone; re-salting re-rolls the whole permutation.

    Shard assignment is growth-stable (a new document never moves an
    existing one to another shard — it only shifts positions AFTER
    its own rank within that shard), so incremental corpus refreshes
    re-write only the shards that received new docs.

    Scale shape: one scan computes the key; the only shuffle is the
    hash-partition by ``shard``; within-shard ranks are a window over
    ~n/n_shards rows — size ``n_shards`` so a shard's ids fit one
    task (the shard_pack discipline), never a single global sort.
    Returns ``(id, shard, pos)`` with pos 1-based per shard."""
    from pyspark.sql.window import Window

    key = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt)))
    shard = (F.conv(F.substring(key, 1, 8), 16, 10).cast("long")
             % n_shards)
    w = Window.partitionBy("shard").orderBy("_key", id_col)
    return (df.select(F.col(id_col), key.alias("_key"),
                      shard.alias("shard"))
            .withColumn("pos", F.row_number().over(w).cast("long"))
            .select(id_col, "shard", "pos"))


def release_manifest(df: DataFrame, id_col: str, text_col: str,
                     n_shards: int = 8) -> DataFrame:
    """Dataset-release manifest — one row per (split, shard) with doc
    and token counts plus an ORDER-DEFINED content digest: md5 over
    the shard's per-doc text md5s joined in training order.  This is
    the artifact a release ships next to the data so any consumer —
    the loader, a mirror, an auditor — can verify it holds exactly
    the documents the release intended, in the intended order, with
    one pass and no doc-level diffing.

    Composes the hash policies (:func:`hash_split` membership,
    :func:`shuffle_order` shard/position), so the manifest is a pure
    function of (ids, texts, salts): any engine derives the identical
    digests.  Scale shape: one scan + the shard hash-partition; the
    per-group ordered fold runs inside one (split, shard) group —
    size ``n_shards`` so a shard's md5 strings fit a task (the
    shard_pack discipline), never a global sort."""
    from goka_spark.functions.text import ws_token_count

    sp = hash_split(df, id_col)
    order = shuffle_order(df, id_col, n_shards)
    base = (df.select(
                F.col(id_col),
                F.md5(F.encode(F.col(text_col), "UTF-8")).alias("_h"),
                ws_token_count(F.col(text_col)).cast("long").alias("_t"))
            .join(sp, id_col).join(order, id_col))
    return (base.groupBy("split", "shard")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("_t").alias("n_tokens"),
                 F.md5(F.array_join(
                     F.transform(
                         F.sort_array(F.collect_list(
                             F.struct(F.col("pos"), F.col("_h")))),
                         lambda s: s["_h"]),
                     "|")).alias("digest")))


def split_contamination_audit(df: DataFrame, id_col: str,
                              text_col: str, shingle: int = 3,
                              splits=(("train", 980), ("validation", 10),
                                      ("test", 10)),
                              salt: str = "split-v1",
                              postings: "DataFrame | None" = None
                              ) -> DataFrame:
    """Post-split leakage AUDIT — for every eval (non-train) document,
    how much of its content already sits in the train split: the
    fraction of its distinct word ``shingle``-grams that occur in ANY
    train document.  This is the release-gate check run AFTER
    :func:`hash_split` (or any split policy): decontamination removes
    known benchmarks from train, but only an audit like this catches
    organic overlap — boilerplate, mirrored pages, templated text —
    that makes eval numbers look better than they are.

    One row per eval doc: ``(id, split, n_sh, hits,
    contamination_e6)`` where ``contamination_e6 =
    floor(1e6 * hits / n_sh)`` (0 for shingle-less docs).

    Scale shape: distinct shingle postings (codegen window pass) +
    one equi-join of eval postings against the distinct train shingle
    set — an inverted-index semi-join on the shingle key, linear in
    postings, never eval×train; the verdict agg is a doc-keyed
    hash-agg with map-side combine."""
    from goka_spark.functions.dedup import shingle_postings

    # ``postings``: an already-built distinct (doc, sh) frame for the
    # SAME (df, shingle) — the session-memo contract of the dedup
    # kernels; built fresh when absent.
    sp = hash_split(df, id_col, list(splits), salt)
    post = ((postings if postings is not None else
             shingle_postings(df, id_col, text_col, n=shingle))
            .join(sp.withColumnRenamed(id_col, "doc"), "doc"))
    train_sh = (post.filter(F.col("split") == "train")
                .select("sh").distinct())
    ev = post.filter(F.col("split") != "train")
    hits = (ev.join(train_sh, "sh", "left_semi")
            .groupBy("doc").agg(F.count("*").alias("hits")))
    per = (ev.groupBy("doc", "split")
           .agg(F.count("*").alias("n_sh"))
           .join(hits, "doc", "left")
           .withColumn("hits", F.coalesce(F.col("hits"), F.lit(0))))
    # eval docs with no shingles (empty text) still appear, at 0
    empty = (sp.filter(F.col("split") != "train")
             .join(post.select("doc").distinct()
                   .withColumnRenamed("doc", id_col), id_col, "left_anti")
             .select(F.col(id_col).alias("doc"), "split",
                     F.lit(0).cast("long").alias("n_sh"),
                     F.lit(0).cast("long").alias("hits")))
    return (per.unionByName(empty)
            .select(F.col("doc").alias(id_col), "split",
                    F.col("n_sh").cast("long"), F.col("hits").cast("long"),
                    F.when(F.col("n_sh") > 0,
                           F.floor(F.col("hits") * 1000000
                                   / F.col("n_sh").cast("double")))
                     .otherwise(0).cast("long").alias("contamination_e6")))


def length_bucket_batches(df: DataFrame, id_col: str, len_col: str,
                          batch_size: int, n_shards: int,
                          max_bucket_pow: int = 12,
                          salt: str = "batch-v1") -> DataFrame:
    """Length-bucketed batch assignment — the loader-side layout that
    keeps padding waste low: documents of similar token length are
    grouped into fixed-size batches so each batch pads to ITS max
    length, not the corpus max.

    Policy, all exact integer / hash arithmetic:
    - bucket = the power-of-two length class (0 for len<2, k for
      2^k ≤ len < 2^(k+1), capped at ``max_bucket_pow``) — FIXED
      boundaries as an integer CASE ladder, deliberately not length
      quantiles: quantile boundaries need a corpus sort/percentile
      pass and shift whenever data is added, power-of-two classes are
      stable, shuffle-free, and within 2× padding waste by
      construction.
    - shard = md5 slot of the id (the loader-worker axis), so batch
      formation is shard-local — exactly how a distributed data
      loader forms batches (each worker batches its own stream;
      no global coordination).
    - pos = md5-rank within (bucket, shard) — the shuffle_order
      discipline: windows span ~n/(buckets·n_shards) rows; size
      ``n_shards`` so a partition fits one task, never a global sort.
    - batch = (pos-1) // batch_size; the last batch per (bucket,
      shard) may be short (the loader drops or pads it).

    Returns ``(id, bucket, shard, batch)``."""
    from pyspark.sql.window import Window

    if batch_size <= 0 or n_shards <= 0:
        raise ValueError("batch_size and n_shards must be positive")
    ln = F.col(len_col)
    bucket = F.lit(max_bucket_pow)
    for k in range(max_bucket_pow - 1, -1, -1):
        bucket = F.when(ln < (1 << (k + 1)), F.lit(k)).otherwise(bucket)
    key = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt)))
    shard = (F.conv(F.substring(key, 1, 8), 16, 10).cast("long")
             % n_shards)
    w = Window.partitionBy("bucket", "shard").orderBy("_key", id_col)
    return (df.select(F.col(id_col), bucket.alias("bucket"),
                      key.alias("_key"), shard.alias("shard"))
            .withColumn("_pos", F.row_number().over(w).cast("long"))
            # integer div, the repo-wide exactness discipline
            .withColumn("batch", F.expr(f"(_pos - 1L) div {batch_size}L"))
            .select(id_col, "bucket", "shard", "batch"))


class CorpusStatsSink:
    """Streaming dataset-card profile — the ingest-monitoring twin of
    the batch ``corpus_stats`` query (goka's stats.go role for a
    document stream): a ``foreachBatch`` sink that writes each
    micro-batch's PARTIAL per-(source, lang) stats to
    ``out_path/epoch_id=N`` and lets ``read()`` merge them.

    Why partials, not a running total: every aggregate kept here is
    associative (count / sum / min / max), so per-epoch partials
    merge exactly at read time — and an epoch overwrite is
    retry-idempotent (the ExactlyOnceBatchSink layout) with no
    read-modify-write race on a running table.  The merge cost is
    #epochs × #groups rows — trivial next to the stream itself.

    ``read()`` returns exactly the batch ``corpus_stats`` schema, so
    a dashboard can swap between the live table and a batch backfill
    without schema changes."""

    def __init__(self, out_path: str, id_col: str, text_col: str,
                 group_cols: "tuple[str, ...]" = ("source", "lang")):
        self.out_path = out_path.rstrip("/")
        self.id_col, self.text_col = id_col, text_col
        self.group_cols = list(group_cols)

    def _partial(self, df: DataFrame) -> DataFrame:
        n_chars = F.length(F.col(self.text_col))
        tokens = F.size(F.filter(
            F.split(F.col(self.text_col), r"\s+"), lambda w: w != ""))
        return (df.groupBy(*self.group_cols)
                .agg(F.count("*").alias("n_docs"),
                     F.sum(tokens.cast("long")).alias("total_tokens"),
                     F.sum(n_chars.cast("long")).alias("total_chars"),
                     F.min(n_chars.cast("long")).alias("min_chars"),
                     F.max(n_chars.cast("long")).alias("max_chars")))

    def __call__(self, batch_df: DataFrame, epoch_id: int) -> None:
        (self._partial(batch_df).write.mode("overwrite")
         .parquet(f"{self.out_path}/epoch_id={int(epoch_id)}"))

    def read(self, spark) -> DataFrame:
        parts = spark.read.parquet(self.out_path)
        return (parts.groupBy(*self.group_cols)
                .agg(F.sum("n_docs").cast("long").alias("n_docs"),
                     F.sum("total_tokens").cast("long")
                     .alias("total_tokens"),
                     F.sum("total_chars").cast("long").alias("total_chars"),
                     F.min("min_chars").cast("long").alias("min_chars"),
                     F.max("max_chars").cast("long").alias("max_chars"))
                .withColumn("mean_chars", F.round(
                    F.col("total_chars") / F.col("n_docs"), 4)))


def span_corruption_masks(df: DataFrame, id_col: str, text_col: str,
                          noise_e6: int = 150000, span_len: int = 3,
                          salt: str = "mask-v1") -> DataFrame:
    """T5-style span-corruption PLAN (Raffel et al. 2020 §3.1.4 —
    the "mask ~15% of tokens in mean-length-3 spans" objective), as a
    deterministic hash policy instead of an RNG: the doc's token
    range is cut into ``n_spans`` equal blocks and each block masks
    one ``span_len``-token span at an md5-derived offset — so spans
    never overlap BY CONSTRUCTION (no greedy iteration to replicate)
    and any engine derives the identical mask layout from
    (id, salt).  Exact integer arithmetic throughout:
    masked = (n·noise_e6 + 5e5) DIV 1e6 (round-half-up),
    n_spans = (2·masked + span_len) DIV (2·span_len).

    One row per doc: (id, n_tokens, n_spans, mask_starts[1-based],
    masked_e6 = realized masked-token millionths).  Pure Column
    expressions — at 100 TB this is scan-stage work, no shuffle at
    all."""
    from goka_spark.functions.text import ws_token_count

    n = ws_token_count(F.col(text_col)).cast("long")
    masked = (n * noise_e6 + 500000) / F.lit(1000000)
    masked = F.floor(masked).cast("long")
    n_spans = F.floor((2 * masked + span_len)
                      / F.lit(2 * span_len)).cast("long")
    block = F.when(n_spans > 0, (n / n_spans).cast("long")) \
        .otherwise(F.lit(0))
    denom = F.greatest(block - span_len + 1, F.lit(1))
    doc_s = F.col(id_col).cast("string")
    starts = F.when(n_spans > 0, F.transform(
        F.sequence(F.lit(0), n_spans - 1),
        lambda b: b * block + 1 + (
            F.conv(F.substring(
                F.md5(F.concat(doc_s, F.lit("-"), b.cast("string"),
                               F.lit(salt))), 1, 8), 16, 10)
            .cast("long") % denom))) \
        .otherwise(F.array().cast("array<bigint>"))
    return df.select(
        F.col(id_col), n.alias("n_tokens"),
        F.coalesce(n_spans, F.lit(0)).alias("n_spans"),
        # '|'-joined string form: keeps the driver's value-hash simple
        # (the bpe_encode token_str discipline); split to recover
        F.array_join(starts.cast("array<string>"), "|")
         .alias("mask_starts"),
        F.when(n > 0, (n_spans * span_len * 1000000 / n).cast("long"))
         .otherwise(0).cast("long").alias("masked_e6"))


def token_budget_plan(df: DataFrame, id_col: str, text_col: str,
                      domain_col: str,
                      budget_mult_e6: int = 2000000,
                      max_epochs: int = 4) -> DataFrame:
    """Data-constrained scaling PLANNER (Muennighoff et al. 2023,
    "Scaling Data-Constrained Language Models": repeating data past
    ~4 epochs has sharply diminishing returns): given a training
    budget of ``budget_mult_e6``·total-corpus-tokens /1e6, the α=1/2
    temperature-smoothed per-source token allocation, the epoch
    count that allocation implies, and the ``max_epochs`` repetition
    verdict — the report that fixes the final mixture BEFORE a run
    burns compute on over-repeated sources.

    Exactness discipline: per-source token totals are one hash-agg
    of exact longs; weights are the temperature_rates integer policy
    (isqrt(n_tokens·10^6) — no libm pow); the budget/allocation/
    epoch ratios use per-factor double casts in fixed association
    (budget·w overflows long at corpus scale — exact while the
    operands stay under 2^53 ≈ 9·10^15 tokens).  Everything after
    the first agg is a sources-sized frame; one broadcast one-row
    cross join for the totals."""
    from goka_spark.functions.text import ws_token_count

    toks = (df.groupBy(domain_col)
            .agg(F.sum(ws_token_count(F.col(text_col)).cast("long"))
                 .cast("long").alias("n_tokens")))
    j = toks.withColumn("_w", _isqrt(F.col("n_tokens") * RATE_MOD))
    sums = j.agg(F.sum("n_tokens").cast("long").alias("_tot"),
                 F.sum("_w").cast("long").alias("_sw"))
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    b = (j.crossJoin(F.broadcast(sums))
         .withColumn("_budget", F.floor(
             d("_tot") * F.lit(float(budget_mult_e6))
             / F.lit(1000000.0)).cast("long"))
         .withColumn("alloc_tokens", F.when(
             F.col("_sw") > 0,
             F.floor(d("_budget") * d("_w") / d("_sw")).cast("long"))
             .otherwise(F.lit(0).cast("long"))))
    epochs = F.when(F.col("n_tokens") > 0, F.floor(
        d("alloc_tokens") / d("n_tokens") * 1000000).cast("long")) \
        .otherwise(F.lit(0).cast("long"))
    return (b.withColumn("epochs_e6", epochs)
            .select(F.col(domain_col), "n_tokens",
                    F.expr("_w * 1000000L DIV _sw").alias("share_e6"),
                    "alloc_tokens", "epochs_e6",
                    (F.col("epochs_e6")
                     > F.lit(max_epochs * 1000000)).alias("capped"),
                    F.least(F.col("alloc_tokens"),
                            F.col("n_tokens") * max_epochs)
                    .alias("capped_alloc_tokens")))


def dataset_card(df: DataFrame, id_col: str, text_col: str,
                 lang_col: str = "lang") -> DataFrame:
    """One-row dataset card — the summary block a released corpus
    ships with (datasheets-for-datasets practice): volume (docs,
    tokens, distinct vocabulary), exact-duplicate rate, dominant
    language share, and the two health regressions (Zipf slope =
    head duplication damage, Heaps β = vocabulary saturation).
    Every number is the already-verified primitive it names —
    the card is a crossJoin of one-row frames, not new arithmetic.

    Scale shape: three corpus passes (scalar aggs, the vocab
    hash-agg, the regressions' postings aggs), then 1-row joins.
    All integer/micro-unit discipline; hash-verifies end to end."""
    from goka_spark.functions.text import (heaps_fit, ws_token_count,
                                           words, zipf_fit)

    base = df.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(ws_token_count(F.col(text_col)).cast("long"))
         .cast("long").alias("n_tokens"),
        F.countDistinct(F.md5(F.col(text_col))).cast("long")
         .alias("_uniq"))
    vocab = (df.select(F.explode(words(F.col(text_col))).alias("_w"))
             .agg(F.countDistinct("_w").cast("long")
                  .alias("vocab_size")))
    lang = (df.groupBy(F.col(lang_col).alias("top_lang"))
            .agg(F.count("*").cast("long").alias("_lc"))
            .orderBy(F.col("_lc").desc(), "top_lang").limit(1))
    z = zipf_fit(df, id_col, text_col) \
        .select(F.col("slope_e6").alias("zipf_slope_e6"))
    h = heaps_fit(df, id_col, text_col) \
        .select(F.col("slope_e6").alias("heaps_beta_e6"))
    card = (base.crossJoin(F.broadcast(vocab))
            .crossJoin(F.broadcast(lang))
            .crossJoin(F.broadcast(z))
            .crossJoin(F.broadcast(h)))
    return card.select(
        "n_docs", "n_tokens", "vocab_size",
        F.expr("(n_docs - _uniq) * 1000000L DIV n_docs")
         .alias("dup_rate_e6"),
        "top_lang",
        F.expr("_lc * 1000000L DIV n_docs").alias("top_lang_share_e6"),
        "zipf_slope_e6", "heaps_beta_e6")


def quality_gate_counts(df: DataFrame, id_col: str, text_col: str,
                        blocklist_terms: "tuple[str, ...]" = ("spam",),
                        entropy_floor_e6: int = 1000000,
                        group_cols: "tuple[str, ...]" = ()) -> DataFrame:
    """Per-gate (n_pass, n_docs) counters for the three STATELESS
    per-document quality gates — the kernel the batch and streaming
    faces share: Gopher repetition keep, word-entropy floor,
    blocklist ratio.  Stateless per doc ⇒ the counters are a SUM
    monoid over any sharding of the corpus (what makes the streaming
    sink exact).  One row per gate."""
    from goka_spark.functions.text import (blocklist_keep,
                                           gopher_repetition,
                                           word_entropy)

    rep = gopher_repetition(df, id_col, text_col) \
        .select(F.col(id_col).alias("_d"), F.col("keep").alias("_rep"))
    ent = word_entropy(df, id_col, text_col) \
        .select(F.col(id_col).alias("_d"),
                ((F.col("n_tokens") > 0)
                 & (F.coalesce(F.col("entropy"), F.lit(0.0))
                    >= entropy_floor_e6 / 1e6)).alias("_ent"))
    gcols = list(group_cols)
    base = df.select(F.col(id_col).alias("_d"), *gcols,
                     blocklist_keep(F.col(text_col),
                                    list(blocklist_terms)).alias("_blk"))
    j = base.join(rep, "_d").join(ent, "_d")
    # gopher's keep is a 0/1 long; normalize every verdict to boolean
    g = j.select(*gcols, F.explode(F.array(
        F.struct(F.lit("repetition").alias("gate"),
                 F.col("_rep").cast("boolean").alias("ok")),
        F.struct(F.lit("entropy").alias("gate"),
                 F.col("_ent").cast("boolean").alias("ok")),
        F.struct(F.lit("blocklist").alias("gate"),
                 F.col("_blk").cast("boolean").alias("ok")))).alias("_g")) \
        .select(*gcols, "_g.gate", "_g.ok")
    return (g.groupBy(*gcols, "gate")
            .agg(F.sum(F.when(F.col("ok"), 1).otherwise(0))
                 .cast("long").alias("n_pass"),
                 F.count("*").cast("long").alias("n_docs")))


class QualityGateSink:
    """Streaming quality-gate monitor — live FILTER-RATE telemetry
    for an ingest stream (the production alarm for upstream
    crawler/source drift: a gate whose pass rate moves between
    epochs means the input changed, not the pipeline): a
    ``foreachBatch`` sink writing each micro-batch's per-gate
    (n_pass, n_docs) counters to ``out_path/epoch_id=N``; the gates
    are per-document STATELESS verdicts, so ``read()`` merges epochs
    by SUM into exactly the batch counters of everything seen
    (stream ≡ batch tested), and ``rates()`` adds the integer
    micro-unit pass rate.  Epoch overwrite is retry-idempotent (the
    ExactlyOnceBatchSink discipline); state is 3 rows per epoch."""

    def __init__(self, out_path: str, id_col: str, text_col: str,
                 blocklist_terms: "tuple[str, ...]" = ("spam",),
                 entropy_floor_e6: int = 1000000):
        self.out_path = out_path.rstrip("/")
        self.id_col, self.text_col = id_col, text_col
        self.blocklist_terms = tuple(blocklist_terms)
        self.entropy_floor_e6 = entropy_floor_e6

    def __call__(self, batch_df: DataFrame, epoch_id: int) -> None:
        counts = quality_gate_counts(batch_df, self.id_col,
                                     self.text_col,
                                     self.blocklist_terms,
                                     self.entropy_floor_e6)
        (counts.write.mode("overwrite")
         .parquet(f"{self.out_path}/epoch_id={int(epoch_id)}"))

    def read(self, spark) -> DataFrame:
        parts = spark.read.parquet(self.out_path)
        return (parts.groupBy("gate")
                .agg(F.sum("n_pass").cast("long").alias("n_pass"),
                     F.sum("n_docs").cast("long").alias("n_docs")))

    def rates(self, spark) -> DataFrame:
        return self.read(spark).select(
            "gate", "n_pass", "n_docs",
            F.expr("n_pass * 1000000L DIV n_docs").alias("pass_e6"))


def doc_chunk(df: DataFrame, id_col: str, text_col: str,
              chunk: int = 64, stride: int = 48) -> DataFrame:
    """Overlapping token-window chunking — the loader/RAG step that
    turns documents into fixed-size training or retrieval units:
    chunk ``i`` covers words [i·stride, i·stride + chunk) of the
    whitespace token sequence, so consecutive chunks overlap by
    ``chunk - stride`` tokens (context continuity across boundaries).
    Every document with ≥1 token emits ≥1 chunk; empty docs emit
    none (documented, matches the oracle).  Output: (doc_id,
    chunk_idx, n_tokens, chunk_text).

    Contrast with ``corpus_pack_sequences`` (packs WHOLE short docs
    into budget bins): chunking SPLITS long docs at a fixed window —
    real pipelines run chunk → pack.

    Scale shape: pure scan stage — split, one ``sequence`` of chunk
    starts per doc (⌈n/stride⌉ elements, bounded by doc length), one
    posexplode, ``slice``/``array_join`` per chunk.  Zero shuffles,
    zero joins, whole-stage codegen end to end; at 100 TB this is
    free ingest-pass work exactly like span_corruption_masks.

    Reference: goka has no chunker (messages are already units);
    this is the C-block loader surface.
    """
    words = F.filter(F.split(F.col(text_col), r"\s+"),
                     lambda w: w != "")
    n = F.size("_ws")
    starts = F.when(
        n > 0,
        F.sequence(F.lit(0),
                   # last chunk start: largest multiple of stride < n
                   ((n - 1) / F.lit(stride)).cast("int") * F.lit(stride),
                   F.lit(stride)))
    return (df.select(F.col(id_col), words.alias("_ws"))
            .select(F.col(id_col), F.col("_ws"),
                    F.posexplode(starts).alias("chunk_idx", "_s"))
            .select(F.col(id_col),
                    F.col("chunk_idx").cast("long"),
                    F.least(F.lit(chunk), F.size("_ws") - F.col("_s"))
                    .cast("long").alias("n_tokens"),
                    F.array_join(
                        F.slice("_ws", F.col("_s") + 1, chunk), " ")
                    .alias("chunk_text")))


def release_diff(old: DataFrame, new: DataFrame, id_col: str,
                 text_col: str) -> DataFrame:
    """Release-to-release delta report — the audit step between two
    corpus versions: per doc id, whether it was ``added`` (id only in
    the new release), ``removed`` (only in the old), ``changed``
    (both, different content hash) or ``unchanged``.  Run before
    publishing to bound retraining blast radius and to catch
    accidental mass deletions; pairs with ``release_manifest`` (the
    per-release digest this diff explains).

    Scale shape: each side reduces to (id, md5) in its scan stage —
    the full-outer join then carries two hashes per doc, never text;
    one shuffle on the id, no skew (ids are unique per side).  At
    100 TB the join input is ~64 bytes/doc — the diff of two
    petabyte releases moves terabytes, not petabytes.
    """
    o = old.select(F.col(id_col),
                   F.md5(F.col(text_col).cast("string")).alias("_ho"))
    n = new.select(F.col(id_col),
                   F.md5(F.col(text_col).cast("string")).alias("_hn"))
    return (o.join(n, id_col, "full_outer")
            .select(F.col(id_col),
                    F.when(F.col("_ho").isNull(), "added")
                     .when(F.col("_hn").isNull(), "removed")
                     .when(F.col("_ho") == F.col("_hn"), "unchanged")
                     .otherwise("changed").alias("status")))


def chunk_dup_report(df: DataFrame, id_col: str, text_col: str,
                     chunk: int = 12) -> DataFrame:
    """Chunk-granular exact-duplicate report — boilerplate detection
    at the unit a RAG store or packing loader actually serves:
    documents are split into NON-overlapping ``chunk``-token windows
    (``doc_chunk`` with stride = chunk, so no chunk duplicates its
    own neighbor by construction) and a chunk instance counts as
    duplicated when its md5 appears ≥2 times corpus-wide.  Per doc:
    chunk count, duplicated-instance count, and the duplicated
    fraction in exact integer ppm — the signal that catches shared
    headers/footers/licenses that doc-level exact dedup (which needs
    the WHOLE text equal) never sees.  Empty docs emit no chunks and
    are absent from the report (doc_chunk contract).

    Scale shape: the chunk scan is doc_chunk's zero-shuffle stage;
    the frequency side reduces every chunk to one 32-byte md5 before
    its hash-agg, and the count join is an equi-join on that hash —
    at 100 TB the shuffled bytes are ~32 B/chunk, never chunk text.
    Reference: goka's per-message hashing (hashutils.go) applied at
    sub-document granularity; the C-block loader surface.
    """
    ch = doc_chunk(df, id_col, text_col, chunk=chunk, stride=chunk)
    h = ch.select(F.col(id_col), F.md5("chunk_text").alias("_h"))
    cnt = h.groupBy("_h").agg(F.count("*").alias("_cnt"))
    return (h.join(cnt, "_h")
            .groupBy(id_col)
            .agg(F.count("*").cast("long").alias("n_chunks"),
                 F.sum((F.col("_cnt") >= 2).cast("long"))
                 .cast("long").alias("n_dup_chunks"))
            .select(F.col(id_col), "n_chunks", "n_dup_chunks",
                    F.expr("n_dup_chunks * 1000000 DIV n_chunks")
                    .cast("long").alias("dup_e6")))


class BoilerplateSink:
    """Streaming boilerplate-line MODEL builder — the ingest-time twin
    of ``text.boilerplate_by_source`` (C135): a ``foreachBatch`` sink
    accumulating per-(source, line-md5) document frequencies and
    per-source doc counts, merged at read time into the boilerplate
    table a production pipeline broadcasts to strip incoming docs.

    Associativity argument (the CorpusStatsSink discipline): each doc
    arrives in exactly ONE micro-batch, so per-epoch distinct-doc
    line counts and source doc counts are disjoint and SUM-merge
    exactly; an epoch overwrite is retry-idempotent
    (ExactlyOnceBatchSink layout).  The doc-count rows ride the same
    parquet with a NULL line hash (one marker row per source per
    epoch), keeping read() a single scan.

    ``read()`` returns ``(source, line_h, df, n_src_docs, boiler)``
    under the exact C135 rule df·1e6 >= ratio_e6·n AND df >= min_df —
    byte-comparable to the batch-derived table over the same data."""

    def __init__(self, out_path: str, id_col: str, text_col: str,
                 source_col: str = "source", sep: str = "\n",
                 ratio_e6: int = 40_000, min_df: int = 2):
        self.out_path = out_path.rstrip("/")
        self.id_col, self.text_col = id_col, text_col
        self.source_col, self.sep = source_col, sep
        self.ratio_e6, self.min_df = ratio_e6, min_df

    def _partial(self, df: DataFrame) -> DataFrame:
        lines = (df.select(
            F.col(self.id_col).alias("_id"),
            F.col(self.source_col).alias("source"),
            F.explode(F.split(F.col(self.text_col), self.sep))
            .alias("_ln"))
            .filter(F.col("_ln") != "")
            .select("_id", "source",
                    F.md5(F.encode("_ln", "UTF-8")).alias("line_h")))
        dfc = (lines.groupBy("source", "line_h")
               .agg(F.count_distinct("_id").cast("long").alias("df"),
                    F.lit(0).cast("long").alias("n_docs")))
        marks = (df.groupBy(F.col(self.source_col).alias("source"))
                 .agg(F.lit(None).cast("string").alias("line_h"),
                      F.lit(0).cast("long").alias("df"),
                      F.count("*").cast("long").alias("n_docs"))
                 .select("source", "line_h", "df", "n_docs"))
        return dfc.unionByName(marks)

    def __call__(self, batch_df: DataFrame, epoch_id: int) -> None:
        (self._partial(batch_df).write.mode("overwrite")
         .parquet(f"{self.out_path}/epoch_id={int(epoch_id)}"))

    def read(self, spark) -> DataFrame:
        parts = spark.read.parquet(self.out_path)
        nsrc = (parts.filter(F.col("line_h").isNull())
                .groupBy("source")
                .agg(F.sum("n_docs").cast("long").alias("n_src_docs")))
        dfs = (parts.filter(F.col("line_h").isNotNull())
               .groupBy("source", "line_h")
               .agg(F.sum("df").cast("long").alias("df")))
        return (dfs.join(F.broadcast(nsrc), "source")
                .select("source", "line_h", "df", "n_src_docs",
                        ((F.col("df") * 1_000_000
                          >= self.ratio_e6 * F.col("n_src_docs"))
                         & (F.col("df") >= self.min_df)).alias("boiler")))
