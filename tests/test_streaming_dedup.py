"""Streaming exact dedup: dropDuplicatesWithinWatermark over a replayed
event stream — the streaming twin of the batch keep-first dedup (U3)."""

from __future__ import annotations

import pandas as pd


def test_streaming_drop_duplicates(spark, tmp_path):
    src = str(tmp_path / "src")
    ts = pd.date_range("2024-01-01", periods=20, freq="1min")
    rows = [
        {"event_id": i % 10, "ts": t, "value": float(i)}  # ids repeat
        for i, t in enumerate(ts)
    ]
    spark.createDataFrame(pd.DataFrame(rows)).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    deduped = (
        stream.withWatermark("ts", "30 minutes")
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT * FROM dedup_out").collect()
    assert len(out) == 10  # one row per distinct event_id
    assert sorted({r.event_id for r in out}) == list(range(10))
