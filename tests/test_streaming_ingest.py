"""Stream -> day-partitioned lake ingestion: layout, pruning, replay guard."""

from __future__ import annotations

import os
import time

import pandas as pd
from pyspark.sql import functions as F

from prometheus_anomaly_detection_lstm_spark.streaming.ingest import (
    read_ingested,
    start_lake_ingest,
)


def test_ingest_lands_day_partitioned_and_prunable(spark, tmp_path):
    src = str(tmp_path / "ing_src")
    out = str(tmp_path / "ing_lake")
    ck = str(tmp_path / "ing_ck")

    def write(rows):
        spark.createDataFrame(pd.DataFrame(rows)).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        time.sleep(1.1)

    t = pd.Timestamp
    write(
        [
            {"ts": t("2024-01-01 10:00:00"), "metric": "a", "value": 1.0},
            {"ts": t("2024-01-02 10:00:00"), "metric": "a", "value": 2.0},
        ]
    )
    write([{"ts": t("2024-01-02 11:00:00"), "metric": "b", "value": 3.0}])

    stream = spark.readStream.schema(
        "ts timestamp, metric string, value double"
    ).option("maxFilesPerTrigger", 1).parquet(src)
    q = start_lake_ingest(stream, out, ck)
    q.awaitTermination(120)

    # day directories exist; batch lineage column carried
    days = sorted(d for d in os.listdir(out) if d.startswith("__day="))
    assert days == ["__day=2024-01-01", "__day=2024-01-02"]
    back = read_ingested(spark, out, key_cols=["ts", "metric"])
    assert back.count() == 3
    # a day predicate prunes partitions at scan time
    one_day = spark.read.parquet(out).filter(F.col("__day") == "2024-01-02")
    plan = one_day._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(__day" in plan
    assert one_day.count() == 2

    # replay guard: append the SAME microbatch content again (simulated
    # foreachBatch replay) -> raw doubles, guarded read does not
    from prometheus_anomaly_detection_lstm_spark.io_tables import (
        write_day_partitioned,
    )

    replay = spark.createDataFrame(
        pd.DataFrame(
            [{"ts": t("2024-01-02 11:00:00"), "metric": "b", "value": 3.0}]
        )
    ).withColumn("__batch", F.lit(1))
    write_day_partitioned(replay, out, mode="append")
    assert spark.read.parquet(out).count() == 4
    assert read_ingested(spark, out, key_cols=["ts", "metric"]).count() == 3


def test_versioned_ingest_end_to_end(spark, tmp_path):
    """Round-4 verdict task 8: micro-batches -> versioned lake in one
    pin — 3 batches produce 3 manifest versions, snapshot_diff returns
    exactly batch 2, and a replayed/re-run batch dedupes writer-side."""
    from prometheus_anomaly_detection_lstm_spark.io_versioned import (
        list_versions,
        read_manifest,
        read_version,
        snapshot_diff,
    )
    from prometheus_anomaly_detection_lstm_spark.streaming.ingest import (
        start_versioned_ingest,
    )

    src = str(tmp_path / "v_src")
    table = str(tmp_path / "v_table")
    ck = str(tmp_path / "v_ck")
    t = pd.Timestamp

    def write(rows):
        spark.createDataFrame(pd.DataFrame(rows)).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        time.sleep(1.1)  # distinct mtimes -> stable file->batch order

    batches = [
        [{"ts": t("2024-01-01 10:00:00"), "metric": "a", "value": 1.0}],
        [
            {"ts": t("2024-01-02 10:00:00"), "metric": "a", "value": 2.0},
            {"ts": t("2024-01-02 11:00:00"), "metric": "b", "value": 3.0},
        ],
        [{"ts": t("2024-01-03 09:00:00"), "metric": "b", "value": 4.0}],
    ]
    for rows in batches:
        write(rows)

    stream = spark.readStream.schema(
        "ts timestamp, metric string, value double"
    ).option("maxFilesPerTrigger", 1).parquet(src)
    q = start_versioned_ingest(stream, table, ck, app_id="ingest-A")
    q.awaitTermination(120)

    # 3 micro-batches -> 3 manifest versions, each carrying its token
    assert list_versions(table) == [1, 2, 3]
    assert [read_manifest(table, v)["batch"] for v in (1, 2, 3)] == [0, 1, 2]
    assert read_version(spark, table).count() == 4  # latest sees all
    assert read_version(spark, table, 1).count() == 1  # time travel

    # CDC: v1 -> v2 is EXACTLY batch 2 (pure append: no removals)
    added, removed = snapshot_diff(spark, table, 1, 2)
    assert removed is None
    got = sorted(
        (r.metric, r.value) for r in added.select("metric", "value").collect()
    )
    assert got == [("a", 2.0), ("b", 3.0)]

    # replay guard 1: a crashed-and-restarted query re-delivers an
    # epoch it already committed -> the manifest token skips it
    replay_df = spark.createDataFrame(pd.DataFrame(batches[2]))
    from prometheus_anomaly_detection_lstm_spark.streaming.ingest import (
        committed_batches,
    )

    assert committed_batches(table, "ingest-A") == {0, 1, 2}
    # simulate foreachBatch replay of epoch 2 through the same guard
    from prometheus_anomaly_detection_lstm_spark.io_versioned import (
        commit_append,
    )

    if 2 not in committed_batches(table, "ingest-A"):  # the guard
        commit_append(replay_df, table, meta={"app": "ingest-A", "batch": 2})
    assert list_versions(table) == [1, 2, 3]  # nothing new

    # replay guard 2: a FULL re-run over the same source (fresh
    # checkpoint, same app_id) re-delivers epochs 0..2 -> all skipped
    q2 = start_versioned_ingest(
        stream, table, str(tmp_path / "v_ck2"), app_id="ingest-A"
    )
    q2.awaitTermination(120)
    assert list_versions(table) == [1, 2, 3]
    assert read_version(spark, table).count() == 4

    # a DIFFERENT logical pipeline is not blocked by A's tokens
    q3 = start_versioned_ingest(
        stream, table, str(tmp_path / "v_ck3"), app_id="ingest-B"
    )
    q3.awaitTermination(120)
    assert len(list_versions(table)) == 6
    assert read_version(spark, table).count() == 8
