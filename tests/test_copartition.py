"""Co-partitioning (copartition_strategy.go): same key ⇒ same partition
when both sides are hash-partitioned the same way — the invariant that
makes goka joins correct, provided for free by Spark's hash shuffle."""

from pyspark.sql import functions as F


def test_same_key_same_partition(spark):
    n = 8
    left = spark.range(0, 200).select(F.col("id").cast("string").alias("key"))
    right = spark.range(0, 200).select(F.col("id").cast("string").alias("key"))
    lp = left.repartition(n, "key").withColumn("p", F.spark_partition_id())
    rp = right.repartition(n, "key").withColumn("p", F.spark_partition_id())
    joined = lp.alias("l").join(rp.alias("r"), "key")
    mismatched = joined.filter(F.col("l.p") != F.col("r.p")).count()
    assert mismatched == 0


def test_processor_forced_copartition(spark, sf_dir):
    """Processor(num_partitions=...) repartitions both join sides."""
    from goka_spark import AggFold, Processor, define_group, input_stream, join, persist
    from goka_spark.queries.base import load

    g = define_group(
        "cp",
        input_stream("events", key="user_id"),
        join("customer", on="c_custkey"),
        persist(AggFold({"cnt": F.count("*")})),
    )
    t = load(spark, sf_dir, "events", "customer")
    table = Processor(g, num_partitions=4).run(t).table
    assert table.count() > 0
