"""Stream-stream interval join (SURVEY §2.8 extension).

The remaining core Structured Streaming operator class the engine
surfaces: joining two live event streams on a key within an event-time
interval — e.g. every error correlated to the click that preceded it
within N minutes (the streaming twin of the batch as-of join).

Both sides carry watermarks and the join condition bounds event time on
both sides, so Spark can expire state: each side buffers only rows
inside its watermark horizon, giving bounded state on an infinite
stream — the property that distinguishes this from a naive
cache-and-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_clicks_errors(
    clicks: DataFrame,
    errors: DataFrame,
    max_gap: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Errors joined to same-user clicks at most ``max_gap`` before them.

    Inputs are streaming DataFrames with (user_id, ts, event_id).
    Output: (user_id, error_id, error_ts, click_id, click_ts) — one row
    per qualifying (click, error) pair; the time bound is two-sided
    (click <= error AND error - click <= gap) as stream-stream inner
    joins require for state expiry on BOTH sides.
    """
    c = clicks.select(
        F.col("user_id"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    ).withWatermark("click_ts", watermark)
    e = errors.select(
        F.col("user_id").alias("e_user_id"),
        F.col("ts").alias("error_ts"),
        F.col("event_id").alias("error_id"),
    ).withWatermark("error_ts", watermark)
    cond = (
        (F.col("user_id") == F.col("e_user_id"))
        & (F.col("click_ts") <= F.col("error_ts"))
        & (F.col("error_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {max_gap}"))
    )
    return c.join(e, cond, "inner").select(
        "user_id",
        "error_id",
        "error_ts",
        "click_id",
        "click_ts",
    )
