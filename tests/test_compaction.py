"""compact_day_partitions: fewer files, identical data, per-day isolation."""

from __future__ import annotations

from pyspark.sql import functions as F

from prometheus_anomaly_detection_lstm_spark.io_tables import (
    compact_day_partitions,
    load_table,
    read_day_partitioned,
    write_day_partitioned,
)

from .conftest import SF_SMALL


def test_compaction_reduces_files_and_preserves_rows(spark, tmp_path):
    ev = load_table(spark, SF_SMALL, "events")
    frag = str(tmp_path / "frag")
    compacted = str(tmp_path / "compact")
    # simulate streaming ingest fragmentation: 16 writers per day
    ev.repartition(16).withColumn("__day", F.to_date("ts")).write.partitionBy(
        "__day"
    ).parquet(frag)
    stats = compact_day_partitions(spark, frag, compacted)
    assert stats["files_after"] < stats["files_before"]
    n_days = ev.select(F.to_date("ts").alias("d")).distinct().count()
    # bin-packing floor: at least one file per day, nowhere near 16/day
    assert n_days <= stats["files_after"] <= stats["files_before"] // 4
    before = read_day_partitioned(spark, frag)
    after = read_day_partitioned(spark, compacted)
    assert after.count() == before.count()
    key = [c for c in after.columns if c != "__day"]
    assert after.select(key).subtract(before.select(key)).count() == 0
    assert before.select(key).subtract(after.select(key)).count() == 0


def test_compaction_splits_oversized_days(spark, tmp_path):
    ev = load_table(spark, SF_SMALL, "events")
    frag = str(tmp_path / "frag")
    compacted = str(tmp_path / "compact")
    write_day_partitioned(ev, frag)
    n = ev.count()
    # force ~4 slots per day: target = quarter of the biggest day
    biggest = (
        ev.groupBy(F.to_date("ts").alias("d")).count().agg(F.max("count")).first()[0]
    )
    stats = compact_day_partitions(
        spark, frag, compacted, target_rows_per_file=max(1, biggest // 4)
    )
    n_days = ev.select(F.to_date("ts").alias("d")).distinct().count()
    assert stats["files_after"] > n_days  # oversized days really split
    assert read_day_partitioned(spark, compacted).count() == n


def test_compacted_output_still_prunes_partitions(spark, tmp_path):
    """Compaction must preserve the lake layout's pruning guarantee:
    a day predicate on the compacted dataset shows up as a
    PartitionFilter (pruned before file listing), not a data filter."""
    ev = load_table(spark, SF_SMALL, "events")
    frag = str(tmp_path / "frag")
    compacted = str(tmp_path / "compact")
    write_day_partitioned(ev, frag)
    compact_day_partitions(spark, frag, compacted)
    df = read_day_partitioned(spark, compacted).filter(
        F.col("__day") == "2024-01-02"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "2024-01-02" in plan.split("PartitionFilters")[1][:200], plan[:800]
