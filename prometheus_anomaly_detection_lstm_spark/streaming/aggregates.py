"""Watermarked windowed aggregation (SURVEY §2.8 / Structured Streaming).

The canonical streaming-aggregation shape for metric streams: event-time
tumbling windows with a watermark bounding state and dropping
too-late data.  In append mode a window's row is emitted exactly once —
when the watermark passes the window end — so downstream sinks (parquet,
Kafka, the exporter) receive finalized rows only.

State size is bounded by (#metrics x windows inside the watermark
horizon) regardless of stream length — the property that lets this run
forever on a cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_metric_stats(
    stream: DataFrame,
    window_duration: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Per (event-time window, metric): count + mean value.

    ``stream`` must carry (ts TIMESTAMP, metric STRING, value DOUBLE).
    Late rows beyond the watermark are DROPPED (never corrupt finalized
    windows); windows emit once in append mode.
    """
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", window_duration).alias("w"),
            "metric",
        )
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "metric",
            "n",
            "avg_value",
        )
    )


def session_metric_windows(
    stream: DataFrame,
    gap: str = "15 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Event-time SESSION windows per metric: a >gap silence closes the
    session (the streaming twin of plans/extended sessionize, which
    buckets by user with the same gap rule).

    ``session_window`` state merges adjacent windows as late-but-
    in-watermark rows arrive and finalizes a session once the watermark
    passes its end + gap; state is bounded by (#keys x open sessions
    inside the horizon).  The same expression body runs in batch mode
    (session_window is a plain grouping expression), which is what the
    equivalence test pins.
    """
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "metric")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "metric",
            "n",
            "sum_value",
        )
    )


def windowed_m4(
    stream: DataFrame,
    window_duration: str = "1 hour",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Streaming twin of plans/mining.m4_downsample: per (event-time
    window, series) keep the four pixel-defining points — first, last,
    min, max — as lexicographic struct extremes with (ts, seq) trailing
    fields for deterministic ties.

    Struct min/max are ordinary aggregates, so state per open window is
    FOUR structs per series regardless of sample rate; append mode
    emits each finalized window exactly once — the live dashboard feed
    whose history the batch operator backfills.

    ``stream`` must carry (ts TIMESTAMP, seq LONG, metric STRING,
    value DOUBLE).
    """
    first = F.min(F.struct("ts", "seq", "value"))
    last = F.max(F.struct("ts", "seq", "value"))
    low = F.min(F.struct("value", "ts", "seq"))
    high = F.max(F.struct("value", "ts", "seq"))
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_duration).alias("w"), "metric")
        .agg(
            F.count("*").alias("n_samples"),
            first.alias("__f"),
            last.alias("__l"),
            low.alias("__lo"),
            high.alias("__hi"),
        )
        .select(
            F.col("w.start").alias("w_start"),
            "metric",
            "n_samples",
            F.col("__f.ts").alias("first_ts"),
            F.round("__f.value", 6).alias("first_v"),
            F.col("__l.ts").alias("last_ts"),
            F.round("__l.value", 6).alias("last_v"),
            F.col("__lo.ts").alias("min_ts"),
            F.round("__lo.value", 6).alias("min_v"),
            F.col("__hi.ts").alias("max_ts"),
            F.round("__hi.value", 6).alias("max_v"),
        )
    )
