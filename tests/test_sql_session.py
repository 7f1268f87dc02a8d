"""The SQL surface: base tables and derived pipeline views queryable
with plain spark.sql."""

from __future__ import annotations

from prometheus_anomaly_detection_lstm_spark.sql_session import register_views

SF = "/root/testdata/sf0.001"


def test_sql_over_base_and_derived_views(spark):
    register_views(spark, SF)
    n = spark.sql("SELECT count(*) AS n FROM events").first()["n"]
    assert n > 0
    wide = spark.sql(
        "SELECT count(*) AS n, count(click) AS c FROM metrics_wide"
    ).first()
    assert wide["n"] > wide["c"] > 0  # sparse wide frame
    top = spark.sql(
        """SELECT window_id, mse FROM anomaly_scores
           ORDER BY mse DESC, window_id LIMIT 3"""
    ).collect()
    assert len(top) == 3 and top[0]["mse"] >= top[-1]["mse"]
    joined = spark.sql(
        """SELECT s.window_id, s.mse, w.click
           FROM anomaly_scores s JOIN metrics_wide w ON s.start_ts = w.ts
           LIMIT 5"""
    )
    assert joined.count() == 5
