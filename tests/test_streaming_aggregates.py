"""Watermarked windowed aggregation: emit-once append + late-data drop."""

from __future__ import annotations

import time

import pandas as pd

from prometheus_anomaly_detection_lstm_spark.streaming.aggregates import (
    windowed_metric_stats,
)


def test_windowed_agg_drops_late_data(spark, tmp_path):
    src = str(tmp_path / "src")

    def write(rows):
        spark.createDataFrame(pd.DataFrame(rows)).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    # Watermark semantics nuance (verified empirically): a late row is
    # only guaranteed dropped once its window's state has been EVICTED —
    # the watermark bounds state, it is not an exact input filter.  The
    # batch sequence therefore: (1) window data, (2) advance max event
    # time, (3) a batch under the advanced watermark that finalizes +
    # evicts the 10:00 window, (4) the too-late row, which now has no
    # state to join and must be dropped without a duplicate append.
    write(
        [
            {"ts": pd.Timestamp(f"2024-01-01 10:0{i}:00"), "metric": "m1",
             "value": float(i)}
            for i in range(5)
        ]
    )
    time.sleep(1.1)  # distinct mtimes -> deterministic file order
    write([{"ts": pd.Timestamp("2024-01-01 11:00:00"), "metric": "m1",
            "value": 99.0}])
    time.sleep(1.1)
    # processed with watermark 10:30 -> finalizes/evicts the 10:00 window
    write([{"ts": pd.Timestamp("2024-01-01 11:01:00"), "metric": "m1",
            "value": 98.0}])
    time.sleep(1.1)
    # the LATE sample: window already finalized -> dropped, no duplicate
    write(
        [
            {"ts": pd.Timestamp("2024-01-01 10:05:00"), "metric": "m1",
             "value": 1000.0},
            {"ts": pd.Timestamp("2024-01-01 11:05:00"), "metric": "m1",
             "value": 100.0},
        ]
    )

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        windowed_metric_stats(stream)
        .writeStream.format("memory")
        .queryName("win_agg_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql(
        "SELECT * FROM win_agg_out ORDER BY window_start"
    ).collect()

    # exactly ONE finalized row for the 10:00 window (no duplicate
    # append from the late record), with batch-1 values only; the open
    # 11:00 window was never emitted
    assert len(out) == 1
    row = out[0]
    assert row.window_start == pd.Timestamp("2024-01-01 10:00:00")
    assert row.metric == "m1"
    assert row.n == 5  # the late 1000.0 sample was dropped
    assert row.avg_value == 2.0  # mean(0..4)


def test_session_windows_stream_equals_batch(spark, tmp_path):
    """Session windows: gap merge + finalize, and the streaming result
    equals running the same operator body in batch mode."""
    from prometheus_anomaly_detection_lstm_spark.streaming.aggregates import (
        session_metric_windows,
    )

    src = str(tmp_path / "sess_src")
    out = str(tmp_path / "sess_out")
    ck = str(tmp_path / "sess_ck")

    def write(rows):
        spark.createDataFrame(pd.DataFrame(rows)).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    # one session: 10:00, 10:10 (gap 15m merges); silence; 11:00 starts
    # a new session; 13:00 advances the watermark far enough to
    # finalize both.
    write(
        [
            {"ts": pd.Timestamp("2024-01-01 10:00:00"), "metric": "m1",
             "value": 1.0},
            {"ts": pd.Timestamp("2024-01-01 10:10:00"), "metric": "m1",
             "value": 2.0},
        ]
    )
    time.sleep(1.1)
    write([{"ts": pd.Timestamp("2024-01-01 11:00:00"), "metric": "m1",
            "value": 4.0}])
    time.sleep(1.1)
    write([{"ts": pd.Timestamp("2024-01-01 13:00:00"), "metric": "m1",
            "value": 8.0}])

    stream = spark.readStream.schema(
        "ts timestamp, metric string, value double"
    ).option("maxFilesPerTrigger", 1).parquet(src)
    q = (
        session_metric_windows(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (str(r["session_start"]), r["n"], r["sum_value"])
        for r in spark.read.parquet(out).collect()
    }
    # finalized sessions: the merged 10:00-10:25 pair and the 11:00 one
    assert ("2024-01-01 10:00:00", 2, 3.0) in got
    assert ("2024-01-01 11:00:00", 1, 4.0) in got

    # batch equivalence on the full input (all sessions, incl. 13:00)
    batch = session_metric_windows(spark.read.parquet(src)).collect()
    batch_set = {
        (str(r["session_start"]), r["n"], r["sum_value"]) for r in batch
    }
    assert got <= batch_set and len(batch_set) == 3


def test_windowed_m4_stream_equals_batch(spark, tmp_path):
    """Streaming M4: per finalized window the four pixel points equal
    the batch operator on the same data, split across microbatches."""
    from prometheus_anomaly_detection_lstm_spark.plans.mining import (
        m4_downsample,
    )
    from prometheus_anomaly_detection_lstm_spark.streaming.aggregates import (
        windowed_m4,
    )

    src = str(tmp_path / "m4_src")
    out = str(tmp_path / "m4_out")
    ck = str(tmp_path / "m4_ck")

    def write(rows):
        spark.createDataFrame(pd.DataFrame(rows)).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    # hour 10: shaped so first/min/max/last are four DISTINCT samples;
    # the 12:00 sample advances the watermark to finalize hour 10.
    write(
        [
            {"ts": pd.Timestamp("2024-01-01 10:05:00"), "seq": 1,
             "metric": "m1", "value": 5.0},
            {"ts": pd.Timestamp("2024-01-01 10:15:00"), "seq": 2,
             "metric": "m1", "value": 1.0},
        ]
    )
    time.sleep(1.1)
    write(
        [
            {"ts": pd.Timestamp("2024-01-01 10:25:00"), "seq": 3,
             "metric": "m1", "value": 9.0},
            {"ts": pd.Timestamp("2024-01-01 10:55:00"), "seq": 4,
             "metric": "m1", "value": 7.0},
        ]
    )
    time.sleep(1.1)
    write([{"ts": pd.Timestamp("2024-01-01 12:00:00"), "seq": 5,
            "metric": "m1", "value": 0.0}])

    stream = spark.readStream.schema(
        "ts timestamp, seq long, metric string, value double"
    ).option("maxFilesPerTrigger", 1).parquet(src)
    q = (
        windowed_m4(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = [
        r
        for r in spark.read.parquet(out).collect()
        if str(r["w_start"]) == "2024-01-01 10:00:00"
    ]
    assert len(rows) == 1
    (r,) = rows
    assert (r["first_v"], r["last_v"], r["min_v"], r["max_v"]) == (
        5.0, 7.0, 1.0, 9.0,
    )
    assert r["n_samples"] == 4

    # batch equivalence: the same aggregate body over the full input
    batch = {
        (str(b["w_start"]), b["metric"], b["first_v"], b["last_v"],
         b["min_v"], b["max_v"], b["n_samples"])
        for b in m4_downsample(
            spark.read.parquet(src).select("metric", "ts", "seq", "value")
        ).collect()
    }
    assert (
        "2024-01-01 10:00:00", "m1", 5.0, 7.0, 1.0, 9.0, 4
    ) in batch
