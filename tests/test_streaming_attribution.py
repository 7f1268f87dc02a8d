"""Streaming last-touch attribution: cross-microbatch touch carry and
stream==batch channel agreement."""

from __future__ import annotations

import time

import pandas as pd

from prometheus_anomaly_detection_lstm_spark.plans.wave5 import (
    last_touch_attribution,
)
from prometheus_anomaly_detection_lstm_spark.streaming.attribution import (
    streaming_attribution,
)

SCHEMA = (
    "ts timestamp, event_id long, user_id long, event_type string, "
    "value double"
)


def _run_stream(spark, src, ck, name):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        streaming_attribution(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"select * from {name}").collect()


def test_touch_carries_across_microbatches(spark, tmp_path):
    """The touch lands in batch 1, the purchase in batch 2 — without
    state the purchase would read 'direct'."""
    src = str(tmp_path / "attr_src")
    ck = str(tmp_path / "attr_ck")

    def write(rows):
        spark.createDataFrame(pd.DataFrame(rows)).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    write(
        [
            {"ts": pd.Timestamp("2024-01-01 10:00:00"), "event_id": 1,
             "user_id": 7, "event_type": "click", "value": 0.0},
        ]
    )
    time.sleep(1.1)
    write(
        [
            {"ts": pd.Timestamp("2024-01-01 10:05:00"), "event_id": 2,
             "user_id": 7, "event_type": "purchase", "value": 42.0},
        ]
    )

    rows = _run_stream(spark, src, ck, "attr_carry")
    assert len(rows) == 1
    r = rows[0]
    assert r["channel"] == "click"
    assert r["value"] == 42.0
    assert r["latency_s"] == 300.0


def test_stream_matches_batch_channel_rollup(spark, tmp_path):
    """Split a multi-user event log across 3 microbatches at awkward
    boundaries; the streamed per-purchase rows must roll up to exactly
    the batch operator's channel table."""
    src = str(tmp_path / "attr2_src")
    ck = str(tmp_path / "attr2_ck")

    all_rows = [
        # user 1: view, click, purchase | purchase (split mid-funnel)
        {"ts": pd.Timestamp("2024-01-01 09:00:00"), "event_id": 1,
         "user_id": 1, "event_type": "view", "value": 0.0},
        {"ts": pd.Timestamp("2024-01-01 09:01:00"), "event_id": 2,
         "user_id": 1, "event_type": "click", "value": 0.0},
        {"ts": pd.Timestamp("2024-01-01 09:02:00"), "event_id": 3,
         "user_id": 1, "event_type": "purchase", "value": 10.0},
        {"ts": pd.Timestamp("2024-01-01 09:30:00"), "event_id": 4,
         "user_id": 1, "event_type": "purchase", "value": 20.0},
        # user 2: purchase with no touch ever -> direct
        {"ts": pd.Timestamp("2024-01-01 09:10:00"), "event_id": 5,
         "user_id": 2, "event_type": "purchase", "value": 5.0},
        # user 2: error then purchase across a batch boundary
        {"ts": pd.Timestamp("2024-01-01 09:40:00"), "event_id": 6,
         "user_id": 2, "event_type": "error", "value": 0.0},
        {"ts": pd.Timestamp("2024-01-01 09:50:00"), "event_id": 7,
         "user_id": 2, "event_type": "purchase", "value": 7.0},
    ]
    batches = [all_rows[:3], all_rows[3:6], all_rows[6:]]

    def write(rows):
        spark.createDataFrame(pd.DataFrame(rows)).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    for b in batches:
        write(b)
        time.sleep(1.1)

    streamed = _run_stream(spark, src, ck, "attr_equiv")
    got = {}
    for r in streamed:
        ch = got.setdefault(r["channel"], {"n": 0, "rev": 0.0, "lat": []})
        ch["n"] += 1
        ch["rev"] += r["value"]
        if r["latency_s"] is not None:
            ch["lat"].append(r["latency_s"])

    ev = spark.createDataFrame(pd.DataFrame(all_rows))
    batch = {
        r["channel"]: r for r in last_touch_attribution(ev).collect()
    }
    assert set(got) == set(batch)
    for ch, b in batch.items():
        assert got[ch]["n"] == b["purchases"]
        assert round(got[ch]["rev"], 2) == b["attributed_revenue"]
        if b["avg_latency_s"] is None:
            assert got[ch]["lat"] == []
        else:
            avg = round(sum(got[ch]["lat"]) / len(got[ch]["lat"]), 2)
            assert avg == b["avg_latency_s"]
