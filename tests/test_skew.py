"""Salted join: answer-identical to the plain join, and actually
spreads the hot key across shuffle partitions."""

from __future__ import annotations

from pyspark.sql import functions as F

from prometheus_anomaly_detection_lstm_spark.operators.skew import salted_join


def _skewed_fact(spark, n=20_000, hot_frac=0.95):
    """~95% of rows share one key — the classic hot-key fact table."""
    hot = int(n * hot_frac)
    return spark.range(n).select(
        F.when(F.col("id") < hot, F.lit(7))
        .otherwise(F.pmod(F.col("id"), F.lit(100)))
        .cast("bigint")
        .alias("k"),
        F.col("id").alias("fact_id"),
    )


def test_salted_join_matches_plain_join(spark):
    fact = _skewed_fact(spark)
    dim = spark.range(100).select(
        F.col("id").alias("k"), F.concat(F.lit("d"), "id").alias("dim_val")
    )
    plain = fact.join(dim, "k").select("fact_id", "dim_val")
    salted = salted_join(fact, dim, "k").select("fact_id", "dim_val")
    a = sorted(map(tuple, plain.collect()))
    b = sorted(map(tuple, salted.collect()))
    assert a == b and len(a) == 20_000


def test_salting_spreads_the_hot_key(spark):
    fact = _skewed_fact(spark)
    parts = 16

    def max_partition_rows(df, *keys):
        return (
            df.repartition(parts, *keys)
            .groupBy(F.spark_partition_id().alias("p"))
            .count()
            .agg(F.max("count"))
            .first()[0]
        )

    salt = F.pmod(F.hash("k", "fact_id"), F.lit(8))
    unsalted_max = max_partition_rows(fact, "k")
    salted_max = max_partition_rows(fact.withColumn("__salt", salt), "k", "__salt")
    # the hot key holds 95% of rows -> unsalted max partition ~19k;
    # 8 salts cut the hottest partition by several x
    assert unsalted_max >= 19_000
    assert salted_max < unsalted_max / 3


def test_salt_is_deterministic(spark):
    fact = _skewed_fact(spark, n=1_000)
    salt = F.pmod(F.hash("k", "fact_id"), F.lit(8))
    s1 = {(r.fact_id, r.s) for r in fact.withColumn("s", salt).collect()}
    s2 = {(r.fact_id, r.s) for r in fact.withColumn("s", salt).collect()}
    assert s1 == s2  # replay/retry routes rows identically
