"""hot_key_skew fixture (FIXTURES.md §3): salting flattens partition sizes.

A single hot (conv_id, turn_idx) holding ~50% of a batch serializes one
reducer under pk-hash partitioning; the salted two-stage reduction bounds
every partition near the median.  Also proves the salted path returns the
same result as the plain reduce on skewed data.
"""

from pyspark.sql import functions as F

from airbyte_custom_spark.operators.dedupe import latest_by_reduce, salted_latest

PK = ("conv_id", "turn_idx")


def skewed_events(spark, n=20_000):
    # 50% of events hit one key; rest spread over 500 keys
    df = spark.range(n)
    hot = F.col("id") % 2 == 0
    return df.select(
        (F.col("id") + 1).alias("lsn"),
        F.lit("u").alias("op"),
        F.when(hot, "conv-hot").otherwise(
            F.concat(F.lit("conv-"), (F.col("id") % 500).cast("string"))
        ).alias("conv_id"),
        F.when(hot, 0).otherwise((F.col("id") % 7).cast("int")).alias("turn_idx"),
        F.concat(F.lit("t"), F.col("id").cast("string")).alias("text"),
    )


def _partition_sizes(df, n_parts, cols):
    sizes = (
        df.repartition(n_parts, *cols)
        .groupBy(F.spark_partition_id().alias("p"))
        .count()
        .collect()
    )
    return sorted(r["count"] for r in sizes)


def test_pk_partitioning_is_skewed_salt_flattens(spark):
    ev = skewed_events(spark)
    plain = _partition_sizes(ev, 8, [F.col(c) for c in PK])
    assert plain[-1] > 3 * (plain[len(plain) // 2] or 1), (
        f"fixture not skewed enough: {plain}"
    )
    salt = F.pmod(F.xxhash64("lsn"), F.lit(16))
    salted = _partition_sizes(ev.withColumn("_s", salt), 8, [*[F.col(c) for c in PK], F.col("_s")])
    median = salted[len(salted) // 2]
    assert salted[-1] <= 2 * median, (
        f"salted partitions not within 2x median: {salted}"
    )


def test_salted_result_equals_plain_on_skew(spark):
    ev = skewed_events(spark, n=10_000)
    a = {tuple(r) for r in latest_by_reduce(ev, PK).select(*PK, "lsn", "text").collect()}
    b = {tuple(r) for r in salted_latest(ev, PK, salt_buckets=16).select(*PK, "lsn", "text").collect()}
    assert a == b
    hot = [r for r in a if r[0] == "conv-hot"]
    # hot events have even ids → lsn = id+1 is odd, max = 9999
    assert len(hot) == 1 and hot[0][2] == 9_999  # highest lsn won
