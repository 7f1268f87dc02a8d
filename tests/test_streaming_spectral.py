"""Streaming spectral residual: one windowed aggregate + per-day FFT UDF.

Pins (1) a planted-spike day alerts on exactly the spiked hour while a
flat day is silent (and absent-hour NULL slots never alert — the
Spark-NaN-orders-above-everything trap), (2) the streamed scores equal
the batch spectral_residual_anomalies scores for the same data, (3) the
same body run in batch over the full input agrees with the stream."""

from __future__ import annotations

import time

import pandas as pd

from prometheus_anomaly_detection_lstm_spark.plans.wave8 import (
    spectral_residual_anomalies,
)
from prometheus_anomaly_detection_lstm_spark.streaming.spectral import (
    streaming_spectral_residual,
)


def _day(day, spike_hr=None, metric="m1", hours=24):
    return [
        {
            "ts": pd.Timestamp(f"2024-03-{day:02d}") + pd.Timedelta(hours=h),
            "metric": metric,
            "value": 100.0 + (900.0 if h == spike_hr else 0.0),
        }
        for h in range(hours)
    ]


def test_streaming_sr_flags_spike_and_matches_batch(spark, tmp_path):
    src = str(tmp_path / "sr_src")
    out = str(tmp_path / "sr_out")
    ck = str(tmp_path / "sr_ck")

    def write(rows):
        spark.createDataFrame(pd.DataFrame(rows)).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    # day 1: flat (silent); day 2: spike at hour 12; day 2 is also
    # PARTIAL (18 hours) so the absent-slot NULL path is exercised;
    # a day-4 sample advances the watermark to finalize both.
    write(_day(1))
    time.sleep(1.1)
    write(_day(2, spike_hr=12, hours=18))
    time.sleep(1.1)
    write(_day(4, hours=1))

    stream = spark.readStream.schema(
        "ts timestamp, metric string, value double"
    ).option("maxFilesPerTrigger", 1).parquet(src)
    q = (
        streaming_spectral_residual(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out).collect()
    assert [(r["day"].day, r["hr"]) for r in got] == [(2, 12)]
    assert got[0]["hourly_value"] == 1000.0

    # streamed scores equal the batch operator on the same data
    static = spark.read.parquet(src).selectExpr(
        "metric", "ts", "monotonically_increasing_id() AS seq", "value"
    )
    batch = {
        (r["metric"], r["day"], r["hr"]): (
            r["hourly_value"],
            r["saliency_score"],
        )
        for r in spectral_residual_anomalies(static).collect()
    }
    stream_rows = {
        (r["metric"], r["day"], r["hr"]): (
            r["hourly_value"],
            r["saliency_score"],
        )
        for r in got
    }
    # every finalized streaming alert matches the batch operator
    # (day 4 is unfinalized in the stream, hence subset)
    assert stream_rows
    for k, v in stream_rows.items():
        assert batch[k] == v

    # microbatch-split invariance: the streaming body itself in batch
    body = {
        (r["metric"], r["day"], r["hr"]): (
            r["hourly_value"],
            r["saliency_score"],
        )
        for r in streaming_spectral_residual(
            spark.read.parquet(src)
        ).collect()
    }
    for k, v in stream_rows.items():
        assert body[k] == v
