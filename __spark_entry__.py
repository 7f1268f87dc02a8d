"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from prometheus_anomaly_detection_lstm_spark.registry import all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: per-window anomaly MSE.

    events -> keep-first dedup + pivot align -> calendar features ->
    ffill/bfill -> MinMax scale -> stride-1 sequence windows ->
    stub-autoencoder reconstruction MSE + threshold flag.
    """
    from prometheus_anomaly_detection_lstm_spark.plans.pipeline import anomaly_flags

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return anomaly_flags(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: fn for name, (fn, _) in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every oracle-expressible query."""
    return {
        name: sql for name, (_, sql) in all_queries().items() if sql is not None
    }
