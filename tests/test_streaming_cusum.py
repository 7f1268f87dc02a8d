"""Streaming CUSUM: batch-split invariance + EXACT agreement with the
batch operator (same recursion, same parameters, same exceedances)."""

from __future__ import annotations

import time

import pandas as pd

from prometheus_anomaly_detection_lstm_spark.plans import robust
from prometheus_anomaly_detection_lstm_spark.streaming.cusum import (
    fit_params,
    streaming_cusum,
)


def _run_stream(spark, tmp_path, batches, params, name):
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
        streaming_cusum(stream, params)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return {
        (r["metric"], r["seq"]): (r["cusum_pos"], r["cusum_neg"], r["side"])
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


# a drifting series: mean shift after sample 10 triggers the upper chart
VALS = [10, 11, 9, 10, 12, 9, 11, 10, 9, 11, 18, 19, 17, 20, 18, 19, 21, 18]


def test_streaming_cusum_is_batch_split_invariant(spark, tmp_path):
    rows = _rows("cpu", 0, VALS)
    params = {"cpu": (10.5, 2.0)}
    one = _run_stream(spark, tmp_path, [rows], params, "cusum_one")
    three = _run_stream(
        spark, tmp_path, [rows[:6], rows[6:12], rows[12:]], params, "cusum_three"
    )
    assert one == three
    assert len(one) > 0  # the planted shift actually alarms


def test_streaming_cusum_matches_batch_operator(spark, tmp_path):
    """Stream over the full data with params fitted on that data ==
    the batch operator (which standardizes per-series on the same
    data): identical exceedance rows and statistics."""
    # long stable segments + sharp late shifts so the exceedances
    # survive WHOLE-data standardization (what the batch operator does)
    cpu = [10, 11, 9, 10, 12, 9, 11, 10, 9, 11] * 4 + [30, 32, 31, 33, 30, 31, 32, 33]
    mem = [50, 51, 49, 50, 52, 49, 51, 50] * 4 + [10, 11, 9, 10, 12, 9, 11, 10]
    rows = _rows("cpu", 0, cpu) + _rows("mem", 0, mem)
    sdf = spark.createDataFrame(pd.DataFrame(rows))
    params = fit_params(sdf)
    batch = {
        (r["metric"], r["seq"]): (r["cusum_pos"], r["cusum_neg"], r["side"])
        for r in robust.cusum_anomalies(
            sdf.select("metric", "ts", "seq", "value")
        ).collect()
    }
    stream = _run_stream(
        spark, tmp_path, [rows[:30], rows[30:60], rows[60:]], params,
        "cusum_vs_batch",
    )
    assert stream == batch
    assert len(batch) > 0
    sides = {s for (_, _, s) in batch.values()}
    assert sides == {"high", "low"}  # both charts exercised


def test_unknown_and_degenerate_series_pass_through(spark, tmp_path):
    rows = _rows("known", 0, VALS) + _rows("mystery", 0, [1, 2, 3, 4]) + _rows(
        "flat", 0, [7] * 8
    )
    params = {"known": (10.5, 2.0), "flat": (7.0, 0.0)}  # flat: sd == 0
    got = _run_stream(spark, tmp_path, [rows], params, "cusum_edge")
    metrics = {m for (m, _) in got}
    assert metrics == {"known"}
