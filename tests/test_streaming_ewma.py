"""Streaming EWMA: batch-split invariance + batch-twin agreement."""

from __future__ import annotations

import time

import pandas as pd
import pytest

from prometheus_anomaly_detection_lstm_spark.streaming.ewma import (
    streaming_ewma,
)

ALPHA = 0.3


def _run_stream(spark, tmp_path, batches, name):
    src = str(tmp_path / f"{name}_src")
    ck = str(tmp_path / f"{name}_ck")
    for rows in batches:
        spark.createDataFrame(pd.DataFrame(rows)).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        time.sleep(1.1)  # distinct file mtimes -> stable batch order
    stream = spark.readStream.schema(
        "ts timestamp, metric string, value double, seq long"
    ).option("maxFilesPerTrigger", 1).parquet(src)
    q = (
        streaming_ewma(stream, ALPHA)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return {
        (r["metric"], r["seq"]): r["ewma"]
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }


def _rows(metric, start_seq, values):
    return [
        {
            "ts": pd.Timestamp("2024-01-01 10:00:00")
            + pd.Timedelta(minutes=start_seq + i),
            "metric": metric,
            "value": float(v),
            "seq": start_seq + i,
        }
        for i, v in enumerate(values)
    ]


def test_streaming_ewma_is_batch_split_invariant(spark, tmp_path):
    """The same sample stream split 1-batch vs 3-batch must produce
    identical per-sample EWMA values — the state carry is exact."""
    vals = [10, 20, 15, 40, 35, 5, 60, 55]
    one = _run_stream(
        spark, tmp_path, [_rows("m", 0, vals)], "ewma_one"
    )
    three = _run_stream(
        spark,
        tmp_path,
        [
            _rows("m", 0, vals[:3]),
            _rows("m", 3, vals[3:5]),
            _rows("m", 5, vals[5:]),
        ],
        "ewma_three",
    )
    assert one == three
    # hand recursion
    level = None
    for i, x in enumerate(vals):
        level = x if level is None else level * (1 - ALPHA) + ALPHA * x
        assert one[("m", i)] == pytest.approx(round(level, 6), abs=1e-9)


def test_streaming_ewma_matches_batch_twin_after_warmup(spark, tmp_path):
    """Streaming (untruncated) vs batch (K-truncated) EWMA agree to
    <1e-6 once a series has >= K samples of history."""
    from prometheus_anomaly_detection_lstm_spark.operators.promql import (
        EWMA_K,
        metric_ewma,
    )

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    vals = [((i * 37) % 100) + 1 for i in range(EWMA_K + 20)]
    streamed = _run_stream(
        spark, tmp_path, [_rows("m", 0, vals)], "ewma_twin"
    )
    batch_df = spark.createDataFrame(
        pd.DataFrame(_rows("m", 0, vals))
    ).selectExpr(
        "CAST(ts AS TIMESTAMP_NTZ) AS ts", "metric", "value", "seq"
    )
    batch = {
        (r.metric, r.seq): r.ewma
        for r in metric_ewma(batch_df, alpha=ALPHA).collect()
    }
    for i in range(EWMA_K, len(vals)):
        assert streamed[("m", i)] == pytest.approx(
            batch[("m", i)], abs=1e-6
        )
