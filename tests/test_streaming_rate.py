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


def test_streaming_rate_over_prometheus_source(spark, tmp_path):
    """Integration: spark.readStream.format('prometheus') -> per-series
    stateful rate.  The stub serves each query a 0,1,2 counter ramp, so
    every series must report increase == 2.0 in its batch."""
    import json

    from prometheus_anomaly_detection_lstm_spark.sources.prometheus import (
        PrometheusDataSource,
    )
    from pyspark.sql import functions as F

    from .test_prometheus_source import _StubProm

    import threading
    from http.server import ThreadingHTTPServer

    srv = ThreadingHTTPServer(("127.0.0.1", 0), _StubProm)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{srv.server_port}"
    try:
        spark.dataSource.register(PrometheusDataSource)
        stream = (
            spark.readStream.format("prometheus")
            .option("url", url)
            .option("queries_json", json.dumps({"m1": "q1", "m2": "q2"}))
            .option("start", "2024-01-01T00:00:00Z")
            .option("end", "2024-01-01T00:10:00Z")
            .option("step_seconds", "120")
            .load()
            .select(
                "ts",
                "metric",
                "value",
                F.col("series_idx").cast("long").alias("seq"),
            )
        )
        from prometheus_anomaly_detection_lstm_spark.streaming.rate import (
            streaming_counter_rate,
        )

        q = (
            streaming_counter_rate(stream)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName("prom_rate_out")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows = spark.sql("SELECT * FROM prom_rate_out").collect()
        agg = {}
        for r in rows:
            a = agg.setdefault(r["metric"], {"inc": 0.0, "n": 0})
            if r["batch_increase"] is not None:
                a["inc"] += r["batch_increase"]
            a["n"] += r["n_samples"]
        assert set(agg) == {"m1", "m2"}
        for m, a in agg.items():
            assert a["n"] == 3, (m, a)
            assert a["inc"] == pytest.approx(2.0), (m, a)
    finally:
        srv.shutdown()
