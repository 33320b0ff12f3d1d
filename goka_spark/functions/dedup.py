"""Deduplication — exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale notes (the whole point of these designs):
- exact: one hash-aggregate on md5(text) — map-side partial agg.
- MinHash/LSH: signatures are nested JVM array expressions over the
  shingle array (no Python); candidate pairs come from a *bucket
  equi-join* on (band, band_hash) — never an O(n²) cross join.
- SimHash: per-bit majority vote via 64 conditional sums in ONE
  hash-aggregate pass (explode words → groupBy doc).
- n-gram Jaccard: inverted-index self-join on shingle, then
  |A∩B| / (|A|+|B|-|A∩B|) — the classic similarity-join plan.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MERSENNE = (1 << 61) - 1


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct n-word shingles, joined by single spaces."""
    from goka_spark.functions.text import words

    w = words(text)
    k = F.greatest(F.size(w) - (n - 1), F.lit(1))
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), k - 1),
            lambda i: F.array_join(F.slice(w, i + 1, n), " "),
        )
    )


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Group identical texts by md5; keep the smallest id as canonical."""
    return (
        df.select(F.col(id_col), F.md5(F.encode(F.col(text_col), "UTF-8")).alias("text_md5"))
        .groupBy("text_md5")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("dup_cnt"))
    )


def _perm_params(num_perm: int, seed: int = 42) -> list[tuple[int, int]]:
    rng = random.Random(seed)
    return [(rng.randrange(1, 1 << 31), rng.randrange(0, 1 << 31))
            for _ in range(num_perm)]


def minhash_signatures(df: DataFrame, id_col: str, text_col: str,
                       num_perm: int = 32, shingle: int = 3) -> DataFrame:
    """MinHash signature per document, fully JVM-side.

    h32 = xxhash64(shingle) & (2^31-1); sig_j = min_s (a_j*h32+b_j) mod M.
    Products stay < 2^62, no overflow.
    """
    params = _perm_params(num_perm)

    # Shingle construction uses interpreted lambda exprs — make sure it
    # fans out across cores even when the source is few small files.
    # (inputFiles() is a metadata call; df.rdd would materialize the plan.)
    sc = df.sparkSession.sparkContext
    try:
        few_inputs = len(df.inputFiles()) < sc.defaultParallelism
    except Exception:
        few_inputs = False
    if few_inputs:
        df = df.repartition(sc.defaultParallelism)

    # explode shingles → hash once per (doc, shingle) → ONE hash
    # aggregate computing all num_perm mins as scalar expressions.
    # Scalar min-aggs stay in whole-stage codegen (array lambdas are
    # interpreted in Spark) and combine map-side: at scale the shuffle
    # carries one partial signature per (partition, doc).
    ex = df.select(
        F.col(id_col),
        F.explode(word_shingles(F.col(text_col), shingle)).alias("_s"),
    ).withColumn("_h", F.xxhash64("_s").bitwiseAND(F.lit((1 << 31) - 1)))
    mins = [
        F.min((F.lit(a) * F.col("_h") + F.lit(b)) % F.lit(MERSENNE)).alias(f"_m{j}")
        for j, (a, b) in enumerate(params)
    ]
    agg = ex.groupBy(id_col).agg(*mins)
    return agg.select(
        F.col(id_col),
        F.array(*[F.col(f"_m{j}") for j in range(num_perm)]).alias("minhash"),
    )


def lsh_bands(sigs: DataFrame, id_col: str, bands: int = 8,
              rows_per_band: int = 4) -> DataFrame:
    """Band the signature: (band_idx, band_hash) per doc — the LSH key."""
    pairs = F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(F.slice("minhash", b * rows_per_band + 1, rows_per_band))
             .alias("band_hash"),
        )
        for b in range(bands)
    ])
    return sigs.select(F.col(id_col), F.explode(pairs).alias("bb")).select(
        id_col, "bb.band", "bb.band_hash")


def lsh_candidate_pairs(banded: DataFrame, id_col: str) -> DataFrame:
    """Bucket equi-join on (band, band_hash) → distinct candidate pairs."""
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(b, on=["band", "band_hash"])
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )


def minhash_lsh_pairs(df: DataFrame, id_col: str, text_col: str,
                      num_perm: int = 32, bands: int = 8) -> DataFrame:
    sigs = minhash_signatures(df, id_col, text_col, num_perm)
    banded = lsh_bands(sigs, id_col, bands, num_perm // bands)
    return lsh_candidate_pairs(banded, id_col)


def simhash(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash per document in one explode + one hash-aggregate."""
    from goka_spark.functions.text import words

    ex = df.select(
        F.col(id_col),
        F.explode(words(F.col(text_col))).alias("_w"),
    ).withColumn("_h", F.xxhash64("_w"))
    votes = [
        F.sum(F.when(F.col("_h").bitwiseAND(F.lit(1 << j)) != 0, 1).otherwise(-1))
         .alias(f"_b{j}")
        for j in range(63)  # 63 bits → result stays a positive long
    ]
    agg = ex.groupBy(id_col).agg(*votes)
    sim = None
    for j in range(63):
        bit = F.when(F.col(f"_b{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        sim = bit if sim is None else sim + bit
    return agg.select(F.col(id_col), sim.alias("simhash"))


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_pairs(df: DataFrame, id_col: str, text_col: str,
                       max_hamming: int = 7, bands: int = 8) -> DataFrame:
    """Near-dup pairs by SimHash with banded blocking: split the 63-bit
    hash into ``bands`` chunks and equi-join on (band_idx, chunk) —
    by pigeonhole, any pair within hamming ≤ bands-1 shares at least
    one intact band, so ``max_hamming <= bands-1`` has NO false
    negatives.  Exact hamming verified inside blocks."""
    s = simhash(df, id_col, text_col)
    width = 63 // bands + 1
    chunks = F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            F.shiftright("simhash", b * width).bitwiseAND(
                F.lit((1 << width) - 1)).alias("chunk"),
        )
        for b in range(bands)
    ])
    blocked = s.select(id_col, "simhash", F.explode(chunks).alias("bb")) \
               .select(id_col, "simhash", "bb.band", "bb.chunk")
    a, b = blocked.alias("a"), blocked.alias("b")
    return (
        a.join(b, on=["band", "chunk"])
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(F.col(f"a.{id_col}").alias("id_a"),
                F.col(f"b.{id_col}").alias("id_b"),
                hamming64(F.col("a.simhash"), F.col("b.simhash")).alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def ngram_jaccard_pairs(df: DataFrame, id_col: str, text_col: str,
                        n: int = 3, threshold: float = 0.05) -> DataFrame:
    """Similarity self-join via inverted index on shingles."""
    sh = df.select(
        F.col(id_col).alias("doc"),
        F.explode(word_shingles(F.col(text_col), n)).alias("sh"),
    )
    sizes = sh.groupBy("doc").agg(F.count("*").alias("sz"))
    a, b = sh.alias("a"), sh.alias("b")
    shared = (
        a.join(b, on="sh")
        .filter(F.col("a.doc") < F.col("b.doc"))
        .groupBy(F.col("a.doc").alias("id_a"), F.col("b.doc").alias("id_b"))
        .agg(F.count("*").alias("shared"))
    )
    sa = sizes.select(F.col("doc").alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc").alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        shared.join(sa, "id_a").join(sb, "id_b")
        .withColumn("jaccard", F.round(
            F.col("shared") / (F.col("sz_a") + F.col("sz_b") - F.col("shared")), 4))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
