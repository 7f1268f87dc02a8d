"""Stream-stream interval join: pairs within gap, state-bounded by
watermarks, batch-equivalent answer."""

from __future__ import annotations

import pandas as pd

from prometheus_anomaly_detection_lstm_spark.streaming.joins import (
    interval_join_clicks_errors,
)


def _rows(kind, items):
    return [
        {"user_id": u, "ts": pd.Timestamp(ts), "event_id": eid}
        for u, ts, eid in items
    ]


def test_interval_join_matches_batch_semantics(spark, tmp_path):
    clicks_dir = str(tmp_path / "clicks")
    errors_dir = str(tmp_path / "errors")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    clicks = _rows(
        "click",
        [
            (1, "2024-01-01 10:05:00", 100),
            (1, "2024-01-01 10:08:00", 101),  # within 10 min of err 500
            (2, "2024-01-01 10:00:00", 102),  # other user
            (1, "2024-01-01 10:40:00", 103),  # after the error: no pair
        ],
    )
    errors = _rows(
        "error",
        [
            (1, "2024-01-01 10:12:00", 500),  # pairs with 100 and 101
            (2, "2024-01-01 10:30:00", 501),  # > 10 min after 102: none
        ],
    )
    spark.createDataFrame(pd.DataFrame(clicks)).write.parquet(clicks_dir)
    spark.createDataFrame(pd.DataFrame(errors)).write.parquet(errors_dir)

    c_stream = spark.readStream.schema(
        spark.read.parquet(clicks_dir).schema
    ).parquet(clicks_dir)
    e_stream = spark.readStream.schema(
        spark.read.parquet(errors_dir).schema
    ).parquet(errors_dir)

    joined = interval_join_clicks_errors(c_stream, e_stream)
    q = (
        joined.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r.error_id, r.click_id)
        for r in spark.read.parquet(out_dir).collect()
    }
    assert got == {(500, 100), (500, 101)}

    # batch twin: same operator body on batch frames gives the same pairs
    batch = interval_join_clicks_errors(
        spark.read.parquet(clicks_dir), spark.read.parquet(errors_dir)
    )
    assert {
        (r.error_id, r.click_id) for r in batch.collect()
    } == got


def test_stream_static_broadcast_enrichment(spark, tmp_path):
    """Stream-static join: each microbatch enriches against a static
    dimension (broadcast per batch, no state) — the streaming twin of
    every dim join in the relational suite."""
    import pandas as pd
    from pyspark.sql import functions as F

    src = str(tmp_path / "ss_src")
    out = str(tmp_path / "ss_out")
    ck = str(tmp_path / "ss_ck")
    spark.createDataFrame(
        pd.DataFrame(
            [
                {"ts": pd.Timestamp("2024-01-01 10:00:00"), "metric": "click",
                 "value": 1.0},
                {"ts": pd.Timestamp("2024-01-01 10:01:00"), "metric": "error",
                 "value": 2.0},
                {"ts": pd.Timestamp("2024-01-01 10:02:00"), "metric": "nope",
                 "value": 3.0},
            ]
        )
    ).coalesce(1).write.mode("append").parquet(src)
    dim = spark.createDataFrame(
        [("click", "engagement"), ("error", "reliability")],
        ["metric", "family"],
    )
    stream = spark.readStream.schema(
        "ts timestamp, metric string, value double"
    ).parquet(src)
    enriched = stream.join(F.broadcast(dim), "metric", "left").withColumn(
        "family", F.coalesce(F.col("family"), F.lit("unmapped"))
    )
    q = (
        enriched.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination(120)
    got = {(r.metric, r.family) for r in spark.read.parquet(out).collect()}
    assert got == {
        ("click", "engagement"), ("error", "reliability"), ("nope", "unmapped")
    }
