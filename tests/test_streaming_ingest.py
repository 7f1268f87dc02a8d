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
