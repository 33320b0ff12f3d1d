"""The r14 Arrow minhash kernel must be BIT-IDENTICAL to the old
explode + min-agg SQL formulation (same shingles, same base hash,
same permutation algebra) — on adversarial lengths that exercise
every XXH64 phase: empty doc, sub-lane, 4/8-byte boundaries, the
31/32/33-byte stripe threshold, multi-stripe words, and unicode."""

from pyspark.sql import functions as F

from goka_spark.functions.dedup import (MERSENNE, _perm_params,
                                        minhash_signatures,
                                        word_shingles)

TEXTS = [
    (0, ""),
    (1, "a"),
    (2, "ab cd"),
    (3, "one two three four five six seven"),
    (4, "x" * 31),
    (5, "y" * 32),
    (6, "z" * 33),
    (7, ("w" * 40 + " ") * 5),
    (8, "héllo wörld ünïcode tëxt日本語 テスト"),
    (9, "repeat repeat repeat repeat repeat"),
    (10, "  leading and   multiple   spaces\ttab\nnewline "),
]


def _old_sigs(df, num_perm, base_hash):
    params = _perm_params(num_perm)
    if base_hash == "md5":
        h = F.conv(F.substring(F.md5(F.encode(F.col("_s"), "UTF-8")),
                               1, 8), 16, 10).cast("long")
    else:
        h = F.xxhash64("_s")
    ex = df.select(
        "doc_id",
        F.explode(word_shingles(F.col("text"), 3)).alias("_s"),
    ).withColumn("_h", h.bitwiseAND(F.lit((1 << 31) - 1)))
    mins = [
        F.min((F.lit(a) * F.col("_h") + F.lit(b)) % F.lit(MERSENNE))
        .alias(f"_m{j}")
        for j, (a, b) in enumerate(params)
    ]
    agg = ex.groupBy("doc_id").agg(*mins)
    return agg.select(
        "doc_id",
        F.array(*[F.col(f"_m{j}") for j in range(num_perm)])
        .alias("minhash"))


def _cmp(spark, num_perm, base_hash):
    df = spark.createDataFrame(TEXTS, "doc_id long, text string")
    new = {r["doc_id"]: r["minhash"]
           for r in minhash_signatures(df, "doc_id", "text",
                                       num_perm=num_perm,
                                       base_hash=base_hash).collect()}
    old = {r["doc_id"]: r["minhash"]
           for r in _old_sigs(df, num_perm, base_hash).collect()}
    assert new == old


def test_kernel_matches_sql_xxhash64(spark):
    _cmp(spark, 32, "xxhash64")


def test_kernel_matches_sql_md5(spark):
    _cmp(spark, 16, "md5")


def test_kernel_matches_sql_md5_8perm(spark):
    _cmp(spark, 8, "md5")


def test_shingle_sets_matches_all_shingles_expr(spark):
    """shingle_sets (the r14 array-twin kernel) must equal
    array_distinct(all_shingles(text)) element-for-element — including
    the wordless-doc [""] contract and first-occurrence order."""
    from goka_spark.functions.dedup import shingle_sets
    from goka_spark.functions.text import all_shingles

    df = spark.createDataFrame(TEXTS + [(11, "   \t\n  ")],
                               "doc_id long, text string")
    new = {r["doc_id"]: r["_shs"]
           for r in shingle_sets(df, "doc_id", "text").collect()}
    old = {r["doc_id"]: r["_shs"]
           for r in df.select(
               "doc_id",
               F.array_distinct(all_shingles(F.col("text")))
               .alias("_shs")).collect()}
    assert new == old
