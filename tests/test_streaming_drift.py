"""Streaming PSI drift: reference profile broadcast, windowed scoring.

Pins (1) a planted drifted window scores far above the stable ones,
(2) the streaming result equals the same scoring body run in batch on
the full input (microbatch-split invariance)."""

from __future__ import annotations

import time

import pandas as pd

from prometheus_anomaly_detection_lstm_spark.streaming.drift import (
    reference_profile,
    streaming_psi,
)


def test_streaming_psi_flags_drifted_window_and_matches_batch(
    spark, tmp_path
):
    src = str(tmp_path / "drift_src")
    out = str(tmp_path / "drift_out")
    ck = str(tmp_path / "drift_ck")

    # reference history: values 0..9 repeating
    ref = spark.createDataFrame(
        [("m1", float(i % 10)) for i in range(200)], "metric string, value double"
    )
    profile = reference_profile(ref)

    def write(rows):
        spark.createDataFrame(pd.DataFrame(rows)).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    def hour(h, vals):
        return [
            {
                "ts": pd.Timestamp("2024-01-01") + pd.Timedelta(hours=h, minutes=i),
                "metric": "m1",
                "value": float(v),
            }
            for i, v in enumerate(vals)
        ]

    # hour 0: in-distribution; hour 1: shifted by +100 (full drift);
    # hour 3 sample advances the watermark to finalize both.
    write(hour(0, [i % 10 for i in range(30)]))
    time.sleep(1.1)
    write(hour(1, [100 + i % 10 for i in range(30)]))
    time.sleep(1.1)
    write(hour(3, [5]))

    stream = spark.readStream.schema(
        "ts timestamp, metric string, value double"
    ).option("maxFilesPerTrigger", 1).parquet(src)
    q = (
        streaming_psi(stream, profile)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["w_start"].hour: (r["n_samples"], r["psi"])
        for r in spark.read.parquet(out).collect()
    }
    assert 0 in got and 1 in got
    assert got[0][0] == 30 and got[1][0] == 30
    assert got[0][1] < 0.1          # in-distribution window
    assert got[1][1] > 2.0          # every sample lands in the top bucket

    # batch twin: the same scoring body over the full static input
    # (withWatermark is a no-op on a batch frame)
    static = spark.read.parquet(src)
    stream_rows = {
        (r["w_start"], r["metric"]): (r["n_samples"], r["psi"])
        for r in spark.read.parquet(out).collect()
    }
    batch_rows = {
        (r["w_start"], r["metric"]): (r["n_samples"], r["psi"])
        for r in streaming_psi(
            static, profile
        ).collect()
    }
    # every finalized streaming window agrees with the batch body
    for key, v in stream_rows.items():
        assert batch_rows[key] == v
