"""Streaming data-quality monitor: the live twin of
plans/wave5.quality_checks.

A batch constraint suite audits a table at rest; a 100-TB ingest
pipeline also needs the same constraints evaluated CONTINUOUSLY so a
bad upstream deploy surfaces in minutes, not at the next batch audit.
This operator evaluates per-event-time-window rates with ONE windowed
aggregate (every check is a conditional sum — the same trick as the
streaming PSI monitor), so adding a check adds a column, never a pass.

Checks (rates in [0, 1] per window):
- null_rate: fraction of events with NULL value
- negative_rate: fraction with value < 0
- dup_event_rate: 1 - approx_distinct(event_id)/count(*) (exact
  distinct is not expressible in append-mode streaming aggregation;
  the batch twin shares the SAME approximate aggregate so the two
  stay comparable — clamped at 0 because HLL can overestimate on
  high-cardinality windows.  An exact batch audit is
  plans/wave5.quality_checks' uniqueness check.)

Watermark bounds state; append mode emits each window once, finalized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WINDOW = "10 minutes"
WATERMARK = "15 minutes"


def _checks(grouped) -> DataFrame:
    n = F.count(F.lit(1))
    return grouped.agg(
        n.alias("n_events"),
        F.round(
            F.sum(F.col("value").isNull().cast("long")) / n, 6
        ).alias("null_rate"),
        F.round(
            F.sum((F.col("value") < 0).cast("long")) / n, 6
        ).alias("negative_rate"),
        F.greatest(
            F.lit(0.0),
            F.round(1.0 - F.approx_count_distinct("event_id") / n, 6),
        ).alias("dup_event_rate"),
    )


def streaming_quality_monitor(
    source: DataFrame,
    window: str = WINDOW,
    watermark: str = WATERMARK,
) -> DataFrame:
    """Wire a streaming (ts, event_id, value, ...) source through the
    windowed quality aggregate; caller attaches sink/checkpoint."""
    return _checks(
        source.withWatermark("ts", watermark).groupBy(
            F.window("ts", window).alias("w")
        )
    ).select(
        F.col("w.start").alias("window_start"),
        "n_events",
        "null_rate",
        "negative_rate",
        "dup_event_rate",
    )


def batch_quality_monitor(events: DataFrame, window: str = WINDOW) -> DataFrame:
    """Batch twin over the same column logic (same aggregate body), for
    the stream==batch agreement test."""
    return _checks(
        events.groupBy(F.window("ts", window).alias("w"))
    ).select(
        F.col("w.start").alias("window_start"),
        "n_events",
        "null_rate",
        "negative_rate",
        "dup_event_rate",
    )
