"""Streaming counter rate: cross-microbatch increase conservation."""

from __future__ import annotations

import time

import pandas as pd
import pytest

from prometheus_anomaly_detection_lstm_spark.streaming.rate import (
    streaming_counter_rate,
)


def test_streaming_rate_conserves_increase_across_batches(spark, tmp_path):
    """Each file becomes its own microbatch; the boundary delta between
    batches must be attributed via carried state, so the streamed
    per-batch increases sum to the batch-mode total — including a
    cross-batch counter reset."""
    src = str(tmp_path / "rate_src")
    ck = str(tmp_path / "rate_ck")

    def write(rows):
        spark.createDataFrame(pd.DataFrame(rows)).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    # batch 1: 10 -> 40; batch 2 starts at 55 (boundary delta 15),
    # then RESETS to 5 (increase contribution 5), climbs to 30.
    write(
        [
            {"ts": pd.Timestamp("2024-01-01 10:00:00"), "metric": "c",
             "value": 10.0, "seq": 1},
            {"ts": pd.Timestamp("2024-01-01 10:01:00"), "metric": "c",
             "value": 40.0, "seq": 2},
        ]
    )
    time.sleep(1.1)
    write(
        [
            {"ts": pd.Timestamp("2024-01-01 10:02:00"), "metric": "c",
             "value": 55.0, "seq": 3},
            {"ts": pd.Timestamp("2024-01-01 10:03:00"), "metric": "c",
             "value": 5.0, "seq": 4},
            {"ts": pd.Timestamp("2024-01-01 10:04:00"), "metric": "c",
             "value": 30.0, "seq": 5},
        ]
    )

    stream = spark.readStream.schema(
        "ts timestamp, metric string, value double, seq long"
    ).option("maxFilesPerTrigger", 1).parquet(src)
    q = (
        streaming_counter_rate(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("rate_out")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = sorted(
        spark.sql("SELECT * FROM rate_out").collect(),
        key=lambda r: r["last_ts"],
    )
    assert len(rows) == 2
    # batch 1: only the in-batch delta (first sample has no predecessor)
    assert rows[0]["batch_increase"] == pytest.approx(30.0)
    assert rows[0]["n_resets"] == 0
    # batch 2: boundary delta 15 (carried state) + reset 5 + 25
    assert rows[1]["batch_increase"] == pytest.approx(15.0 + 5.0 + 25.0)
    assert rows[1]["n_resets"] == 1
    assert rows[1]["last_value"] == 30.0

    # conservation: streamed sum == batch-mode total increase
    from prometheus_anomaly_detection_lstm_spark.operators import promql

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    batch_total = (
        promql.counter_rate(
            spark.read.parquet(src).selectExpr(
                "cast(ts as timestamp_ntz) ts", "metric", "value", "seq"
            ),
            bucket_s=3600,
        )
        .agg({"increase": "sum"})
        .collect()[0][0]
    )
    streamed_total = sum(r["batch_increase"] for r in rows)
    assert streamed_total == pytest.approx(batch_total, abs=2e-6)
