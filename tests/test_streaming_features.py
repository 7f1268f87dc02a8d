"""Streaming point-in-time features: cross-batch horizon state,
stream==batch snapshot agreement, bounded-state prune."""

from __future__ import annotations

import time

import pandas as pd

from prometheus_anomaly_detection_lstm_spark.plans.wave5 import (
    pointintime_features,
)
from prometheus_anomaly_detection_lstm_spark.streaming.features import (
    streaming_pointintime_features,
)

SCHEMA = (
    "ts timestamp, event_id long, user_id long, event_type string, "
    "value double"
)


def test_stream_matches_batch_snapshots_across_batches(spark, tmp_path):
    """A purchase whose 7-day horizon spans three microbatches must get
    the same snapshot as the batch RANGE-frame operator."""
    src = str(tmp_path / "pit_src")
    ck = str(tmp_path / "pit_ck")

    all_rows = [
        # batch 1: early activity (inside horizon of the day-6 purchase)
        {"ts": pd.Timestamp("2024-01-01 10:00:00"), "event_id": 1,
         "user_id": 1, "event_type": "click", "value": 0.0},
        {"ts": pd.Timestamp("2024-01-02 10:00:00"), "event_id": 2,
         "user_id": 1, "event_type": "view", "value": 0.0},
        # batch 2: a purchase (counts toward later spend) + stale noise
        {"ts": pd.Timestamp("2024-01-03 10:00:00"), "event_id": 3,
         "user_id": 1, "event_type": "purchase", "value": 10.0},
        {"ts": pd.Timestamp("2024-01-04 10:00:00"), "event_id": 4,
         "user_id": 1, "event_type": "error", "value": 0.0},
        # batch 3: the graded purchase on day 6
        {"ts": pd.Timestamp("2024-01-06 10:00:00"), "event_id": 5,
         "user_id": 1, "event_type": "purchase", "value": 20.0},
        # and one outside any horizon (day 20)
        {"ts": pd.Timestamp("2024-01-20 10:00:00"), "event_id": 6,
         "user_id": 1, "event_type": "purchase", "value": 5.0},
    ]
    batches = [all_rows[:2], all_rows[2:4], all_rows[4:]]

    def write(rows):
        spark.createDataFrame(pd.DataFrame(rows), schema=SCHEMA).coalesce(
            1
        ).write.mode("append").parquet(src)

    for b in batches:
        write(b)
        time.sleep(1.1)

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        streaming_pointintime_features(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("pit_out")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        r["event_id"]: r
        for r in spark.sql("select * from pit_out").collect()
    }

    ev = spark.createDataFrame(pd.DataFrame(all_rows), schema=SCHEMA)
    batch = {r["event_id"]: r for r in pointintime_features(ev).collect()}

    assert set(streamed) == set(batch) == {3, 5, 6}
    for eid in batch:
        for c in ("n_clicks_7d", "n_views_7d", "n_errors_7d", "spend_7d"):
            assert streamed[eid][c] == batch[eid][c], (eid, c)
    # spot-check the cross-batch snapshot explicitly
    assert streamed[5]["n_clicks_7d"] == 1
    assert streamed[5]["n_views_7d"] == 1
    assert streamed[5]["n_errors_7d"] == 1
    assert streamed[5]["spend_7d"] == 10.0
    # day-20 purchase: everything is out of horizon
    assert streamed[6]["spend_7d"] == 0.0
    assert streamed[6]["n_clicks_7d"] == 0
