"""Streaming quality monitor: finalized windows, planted violations,
stream==batch agreement."""

from __future__ import annotations

import time

import pandas as pd

from prometheus_anomaly_detection_lstm_spark.streaming.quality import (
    batch_quality_monitor,
    streaming_quality_monitor,
)

SCHEMA = "ts timestamp, event_id long, value double"


def test_streaming_quality_flags_planted_violations(spark, tmp_path):
    src = str(tmp_path / "q_src")
    ck = str(tmp_path / "q_ck")

    def write(rows):
        spark.createDataFrame(
            pd.DataFrame(rows), schema=SCHEMA
        ).coalesce(1).write.mode("append").parquet(src)

    # window 10:00-10:10 — clean: 4 events, no nulls/negatives/dupes
    clean = [
        {"ts": pd.Timestamp(f"2024-01-01 10:0{i}:00"), "event_id": i,
         "value": float(i)} for i in range(4)
    ]
    # window 10:10-10:20 — dirty: 1 null, 1 negative, 1 duplicate id
    dirty = [
        {"ts": pd.Timestamp("2024-01-01 10:11:00"), "event_id": 10,
         "value": None},
        {"ts": pd.Timestamp("2024-01-01 10:12:00"), "event_id": 11,
         "value": -5.0},
        {"ts": pd.Timestamp("2024-01-01 10:13:00"), "event_id": 12,
         "value": 1.0},
        {"ts": pd.Timestamp("2024-01-01 10:14:00"), "event_id": 12,
         "value": 2.0},
    ]
    # late batch far ahead closes both windows past the watermark
    closer = [
        {"ts": pd.Timestamp("2024-01-01 11:00:00"), "event_id": 99,
         "value": 0.0},
    ]
    write(clean)
    time.sleep(1.1)
    write(dirty)
    time.sleep(1.1)
    write(closer)

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        streaming_quality_monitor(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("qmon")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = {
        r["window_start"].strftime("%H:%M"): r
        for r in spark.sql("select * from qmon").collect()
    }
    assert out["10:00"]["null_rate"] == 0.0
    assert out["10:00"]["negative_rate"] == 0.0
    assert out["10:00"]["dup_event_rate"] == 0.0
    assert out["10:10"]["null_rate"] == 0.25
    assert out["10:10"]["negative_rate"] == 0.25
    assert out["10:10"]["dup_event_rate"] == 0.25

    # stream == batch on the same data (the 11:00 window is not
    # finalized in the stream, so compare only the closed ones)
    ev = spark.createDataFrame(
        pd.DataFrame(clean + dirty + closer), schema=SCHEMA
    )
    batch = {
        r["window_start"].strftime("%H:%M"): r
        for r in batch_quality_monitor(ev).collect()
    }
    for k in ("10:00", "10:10"):
        for c in ("n_events", "null_rate", "negative_rate", "dup_event_rate"):
            assert out[k][c] == batch[k][c], (k, c)
