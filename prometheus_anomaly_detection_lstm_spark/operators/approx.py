"""Approximate aggregates — the 100-TB fallbacks for exact operators.

Exact `median`/`percentile`/`count(DISTINCT)` hold a full sort or a
per-group set; at cluster scale the sketch versions (HLL++ for distinct,
GK/t-digest-style quantile summaries for percentiles) are the right
default.  These are inherently non-deterministic across engines, so
they ship as rows-only registry entries; accuracy is bounds-tested
against the exact operators in tests/test_approx.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io_tables import load_table
from ..plans import pipeline as P


def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ distinct per event type (rsd 2%) beside the exact count."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.countDistinct("user_id").alias("exact_users"),
    )


def approx_threshold_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percentile_approx thresholds beside the exact ones (A11 at scale)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    mse = P.anomaly_scores(spark, sf_dir)
    return mse.agg(
        F.percentile_approx("mse", 0.95, 10_000).alias("p95_approx"),
        F.percentile("mse", 0.95).alias("p95_exact"),
        F.percentile_approx("mse", 0.99, 10_000).alias("p99_approx"),
        F.percentile("mse", 0.99).alias("p99_exact"),
    )


QUERIES = {
    # approximate by design -> rows-only driver check; accuracy bounds in tests
    "approx_distinct_users": (approx_distinct_users, None),
    "approx_threshold_percentiles": (approx_threshold_percentiles, None),
}
