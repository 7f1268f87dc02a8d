"""Streaming absent-series detection: event-time timeout lifecycle."""

from __future__ import annotations

import time

import pandas as pd

from prometheus_anomaly_detection_lstm_spark.streaming.absent import (
    streaming_absent,
)


def test_silent_series_detected_when_watermark_passes_deadline(
    spark, tmp_path
):
    """Series `a` reports once then goes silent; series `b` keeps
    reporting and drags the watermark forward.  When the watermark
    passes a's (last_seen + gap) deadline, exactly one absent row for
    `a` fires — and `b`, still alive, never alerts."""
    src = str(tmp_path / "absent_src")
    ck = str(tmp_path / "absent_ck")

    def write(rows):
        spark.createDataFrame(pd.DataFrame(rows)).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        time.sleep(1.1)

    t = pd.Timestamp
    # batch 1: both series alive at 10:00
    write(
        [
            {"ts": t("2024-01-01 10:00:00"), "metric": "a", "value": 1.0},
            {"ts": t("2024-01-01 10:00:00"), "metric": "b", "value": 1.0},
        ]
    )
    # batch 2: only b; watermark after this batch = 11:00 - 1m = 10:59
    write([{"ts": t("2024-01-01 11:00:00"), "metric": "b", "value": 2.0}])
    # batch 3: only b again; at its START the watermark (10:59) is past
    # a's deadline 10:10 -> a's timeout fires in this batch
    write([{"ts": t("2024-01-01 11:30:00"), "metric": "b", "value": 3.0}])

    stream = spark.readStream.schema(
        "ts timestamp, metric string, value double"
    ).option("maxFilesPerTrigger", 1).parquet(src)
    q = (
        streaming_absent(stream, gap_s=600)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("absent_out")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM absent_out").collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["metric"] == "a"
    assert r["last_seen"] == t("2024-01-01 10:00:00").to_pydatetime()
    assert r["deadline"] == t("2024-01-01 10:10:00").to_pydatetime()
