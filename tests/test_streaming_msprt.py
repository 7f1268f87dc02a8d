"""Streaming mSPRT: batch-split invariance + agreement with the batch
always-valid operator on day-aligned batches."""

from __future__ import annotations

import time

import numpy as np
import pandas as pd

from prometheus_anomaly_detection_lstm_spark.plans.wave9 import ab_sequential
from prometheus_anomaly_detection_lstm_spark.streaming.msprt import (
    streaming_msprt,
)

SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double"
)


def _purchase_rows(n_days=6, per_day=40, lift=2.0, seed=7):
    """Variant 1 (odd user_id) gets a real lift so the monitor should
    eventually call it."""
    rng = np.random.default_rng(seed)
    rows, eid = [], 0
    for d in range(n_days):
        for i in range(per_day):
            uid = int(rng.integers(0, 10_000))
            v = float(rng.normal(10.0, 2.0))
            if uid % 2 == 1:
                v += lift
            rows.append(
                {
                    "event_id": eid,
                    "ts": pd.Timestamp("2024-05-01")
                    + pd.Timedelta(days=d, minutes=i),
                    "user_id": uid,
                    "event_type": "purchase",
                    "value": v,
                }
            )
            eid += 1
    return rows


def _run_stream(spark, tmp_path, batches, name):
    src = str(tmp_path / f"{name}_src")
    ck = str(tmp_path / f"{name}_ck")
    for rows in batches:
        spark.createDataFrame(pd.DataFrame(rows)).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        time.sleep(1.1)
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        streaming_msprt(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql(
        f"SELECT * FROM {name} ORDER BY day, n0 + n1"
    ).collect()
    # update semantics: the LAST emission per day is the day's readout
    latest = {}
    for r in rows:
        latest[r.day] = (
            r.n0, r.n1, r.delta, r.log_lr, r.p_always_valid, r.significant
        )
    return latest


def test_streaming_msprt_split_invariant_and_matches_batch(spark, tmp_path):
    rows = _purchase_rows()
    days = sorted({r["ts"].floor("D") for r in rows})
    by_day = [
        [r for r in rows if r["ts"].floor("D") == d] for d in days
    ]

    # one batch vs day-aligned batches: identical final per-day readout
    one = _run_stream(spark, tmp_path, [rows], "msprt_one")
    split = _run_stream(spark, tmp_path, by_day, "msprt_split")
    assert one == split
    assert len(one) == len(days)

    # day-aligned stream == the batch always-valid operator
    ev = spark.createDataFrame(pd.DataFrame(rows), SCHEMA)
    batch = {
        r.day: (
            r.n0, r.n1, r.delta, r.log_lr, r.p_always_valid, r.significant
        )
        for r in ab_sequential(ev).collect()
    }
    assert set(batch) == set(split)
    for day, b in batch.items():
        s = split[day]
        assert s[:2] == b[:2]  # counts exact
        for x, y in zip(s[2:5], b[2:5]):  # rounded floats
            assert abs(x - y) <= 1e-6
        assert s[5] == b[5]  # the decision sequence agrees

    # the planted lift is eventually called significant
    assert one[max(one)][5] == 1

    # mid-day split: within-day peeking re-emits the day with its
    # latest cumulative stats.  The final cumulative fields (n0, n1,
    # delta, log_lr) are unchanged, but p_always_valid is a RUNNING MIN
    # over peeks — an extra mid-day peek can only lower it (and a lower
    # p can only add significance), so equality is not guaranteed by
    # mSPRT semantics for non-day-aligned batches.
    half = len(rows) // 2
    mid = _run_stream(
        spark, tmp_path, [rows[:half], rows[half:]], "msprt_mid"
    )
    assert set(mid) == set(one)
    for day, m in mid.items():
        o = one[day]
        assert m[:2] == o[:2]  # counts exact
        for x, y in zip(m[2:4], o[2:4]):  # rounded floats
            assert abs(x - y) <= 1e-6
        assert m[4] <= o[4] + 1e-9  # extra peek only lowers running-min p
        assert m[5] >= o[5]  # lower p never un-calls significance
