"""SparkSession factory with scale-appropriate defaults.

The session is configured for oracle parity (UTC session timezone — the
reference's timestamps are timezone-naive, SURVEY §1.2) and for scale
(AQE on, Arrow on, shuffle partitions sized to cores locally; on a real
cluster these come from spark-submit conf instead).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "prometheus_anomaly_detection_lstm_spark") -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
    )
    active = SparkSession.getActiveSession()
    if active is not None:
        return active
    master = os.environ.get("SPARK_MASTER")
    builder = builder.master(master if master else f"local[{cpus}]")
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
