"""Stateful ring-buffer detector: state persists across micro-batches,
so a window completes from buffered history + a small new delta."""

from __future__ import annotations

import glob
import os

import pandas as pd
import pytest

from prometheus_anomaly_detection_lstm_spark.streaming.stateful import (
    stateful_detector_stream,
)

METRICS = ["cpu", "mem"]
L = 6


def _rows(start_min: int, n: int, value: float = 0.5):
    ts = pd.date_range("2024-01-01", periods=200, freq="2min")[
        start_min : start_min + n
    ]
    return pd.DataFrame(
        [
            {"detector_id": "d1", "ts": t, "metric": m, "value": value}
            for m in METRICS
            for t in ts
        ]
    )


@pytest.mark.filterwarnings("ignore")
def test_window_completes_from_state(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    # batch 1: L-1 points (insufficient); batch 2: 3 more points
    spark.createDataFrame(_rows(0, L - 1)).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    scored = stateful_detector_stream(stream, METRICS, sequence_length=L)
    q = (
        scored.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    first = spark.read.parquet(out).toPandas()
    assert len(first) == 1
    assert first.iloc[0]["n_points"] == L - 1  # insufficient, no score
    assert pd.isna(first.iloc[0]["window_end"])
    assert pd.isna(first.iloc[0]["mse"])

    # second drop: only 3 NEW points — the window must complete from state
    spark.createDataFrame(_rows(L - 1, 3)).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    q2 = (
        stateful_detector_stream(
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src),
            METRICS,
            sequence_length=L,
        )
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(180)

    both = spark.read.parquet(out).toPandas().sort_values("n_points")
    assert len(both) == 2
    last = both.iloc[-1]
    # only 3 new points arrived, yet the window completed from state
    assert last["n_points"] >= L
    assert last["mse"] > 0
    assert not pd.isna(last["window_end"])
