"""Streaming SAX novelty: frozen reference, single windowed aggregate.

Pins (1) a day replaying a KNOWN shape is silent while a novel shape
alerts, (2) the streamed word equals the batch sax_symbols word for the
same data (the single-aggregate 24-conditional-means fold is exact),
(3) the same body run in batch over the full input agrees with the
stream (microbatch-split invariance)."""

from __future__ import annotations

import time

import pandas as pd

from prometheus_anomaly_detection_lstm_spark.plans.wave8 import sax_symbols
from prometheus_anomaly_detection_lstm_spark.streaming.sax import (
    sax_reference,
    streaming_sax_novelty,
)


def _day(day, highs, metric="m1"):
    """4 hourly samples: value 10 in `highs` hours, 0 elsewhere —
    the same constructed shapes as the batch motif pin."""
    return [
        {
            "ts": pd.Timestamp(f"2024-03-0{day}") + pd.Timedelta(hours=h),
            "metric": metric,
            "value": 10.0 if h in highs else 0.0,
        }
        for h in range(4)
    ]


def test_streaming_sax_flags_novel_day_and_matches_batch(spark, tmp_path):
    src = str(tmp_path / "sax_src")
    out = str(tmp_path / "sax_out")
    ck = str(tmp_path / "sax_ck")

    # history: two days of the (2, 3)-high shape -> known word "aadd"
    hist = spark.createDataFrame(
        pd.DataFrame(_day(1, (2, 3)) + _day(2, (2, 3)))
    )
    stats, known = sax_reference(hist)
    assert [r.word for r in known.collect()] == ["aadd"]

    def write(rows):
        spark.createDataFrame(pd.DataFrame(rows)).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    # day 3 replays the known shape; day 4 is novel (0, 1)-high;
    # a day-6 sample advances the watermark to finalize both.
    write(_day(3, (2, 3)))
    time.sleep(1.1)
    write(_day(4, (0, 1)))
    time.sleep(1.1)
    write(_day(6, (2, 3))[:1])

    stream = spark.readStream.schema(
        "ts timestamp, metric string, value double"
    ).option("maxFilesPerTrigger", 1).parquet(src)
    q = (
        streaming_sax_novelty(stream, stats, known)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["day"].day: r for r in spark.read.parquet(out).collect()}
    # day 3 (known shape) is silent; day 4 alerts with the novel word
    assert 3 not in got
    assert got[4]["word"] == "ddaa"
    assert got[4]["n_segments"] == 4

    # the streamed word equals batch sax_symbols on the same data
    # (reference stats == batch stats here: same value distribution)
    batch_day4 = spark.createDataFrame(pd.DataFrame(_day(4, (0, 1))))
    assert sax_symbols(batch_day4).collect()[0].word == "ddaa"

    # microbatch-split invariance: same body over the full static input
    static = spark.read.parquet(src)
    batch_rows = {
        (r["metric"], r["day"], r["n_segments"], r["word"])
        for r in streaming_sax_novelty(static, stats, known).collect()
    }
    stream_rows = {
        (r["metric"], r["day"], r["n_segments"], r["word"])
        for r in spark.read.parquet(out).collect()
    }
    assert stream_rows <= batch_rows  # stream = finalized subset
    for row in stream_rows:
        assert row in batch_rows
