"""Stride-1 sliding-window sequence construction (SURVEY §2.6-W2, H1).

Reference: ``xs[i] = data[i:i+L]`` for ``i in [0, n-L]``
(train_autoencoder.py:61-74, duplicated filter_anomalous_data.py:57-67);
empty when ``n < L``.

Two implementations with identical results:

* :func:`sequence_windows` — window-frame ``collect_list`` over the
  global timestamp order.  Correct anywhere, but an unpartitioned
  ORDER BY collapses to one task — use for small frames / per-key
  already-partitioned data.

* :func:`sequence_windows_scalable` — the 100-TB path.  Rows are hashed
  to calendar-day buckets; each day's first L-1 rows are ALSO shipped to
  the previous day as overlap (a second, cheap shuffle of only L-1 rows
  per boundary), then windows are built per-day in parallel with
  ``applyInPandas``.  Only windows STARTING on a native (non-overlap)
  row are emitted, so every stride-1 window appears exactly once.

Rather than materializing the O(n·L·F) tensor (the reference's 20×
memory amplification, SURVEY §4-O8), downstream scoring composes the
per-row error first and windows the scalar — see operators/score.py.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sequence_windows(
    df: DataFrame, feature_cols: list[str], length: int, ts_col: str = "ts"
) -> DataFrame:
    """W2 via window frame: (window_id, start_ts, features ARRAY<ARRAY<DOUBLE>>)."""
    row = F.array(*[F.col(c).cast("double") for c in feature_cols])
    w = Window.orderBy(ts_col).rowsBetween(0, length - 1)
    return (
        df.withColumn("__row", row)
        .withColumn("features", F.collect_list("__row").over(w))
        .withColumn(
            "window_id",
            F.row_number().over(Window.orderBy(ts_col)).cast("bigint") - 1,
        )
        .filter(F.size("features") == length)
        .select(
            "window_id", F.col(ts_col).alias("start_ts"), "features"
        )
    )


def sequence_windows_scalable(
    df: DataFrame, feature_cols: list[str], length: int, ts_col: str = "ts"
) -> DataFrame:
    """W2 at scale: day-bucketed build with L-1 rows of boundary overlap.

    Window ids are assigned per-day then offset by the global running
    count of prior days' rows (computed on the tiny per-day summary), so
    ids equal the global 0-based start-row offset without any global
    row-numbering pass.
    """
    day = F.to_date(F.col(ts_col))
    with_day = df.select(
        F.col(ts_col),
        *[F.col(c).cast("double") for c in feature_cols],
    ).withColumn("__day", day)

    # Global offset of each day's first row = cumulative rows of prior days.
    counts = with_day.groupBy("__day").agg(F.count("*").alias("__n"))
    w_days = Window.orderBy("__day").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "__day", F.coalesce(F.sum("__n").over(w_days), F.lit(0)).alias("__offset")
    )

    # Overlap: first L-1 rows of each day also join the PREVIOUS day.
    w_in_day = Window.partitionBy("__day").orderBy(ts_col)
    ranked = with_day.withColumn("__rk", F.row_number().over(w_in_day))
    native = ranked.withColumn("__bucket", F.col("__day")).withColumn(
        "__is_native", F.lit(True)
    )
    overlap = (
        ranked.filter(F.col("__rk") <= length - 1)
        .withColumn("__bucket", F.date_sub(F.col("__day"), 1))
        .withColumn("__is_native", F.lit(False))
    )
    both = native.unionByName(overlap).join(
        F.broadcast(offsets.withColumnRenamed("__day", "__bucket")), "__bucket"
    )

    schema = "window_id bigint, start_ts timestamp, features array<array<double>>"

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([ts_col]).reset_index(drop=True)
        vals = pdf[feature_cols].to_numpy()
        n = len(pdf)
        out_id, out_ts, out_feat = [], [], []
        offset = int(pdf["__offset"].iloc[0]) if n else 0
        native_rank = 0
        for i in range(n):
            is_native = bool(pdf["__is_native"].iloc[i])
            if is_native and i + length <= n:
                out_id.append(offset + native_rank)
                out_ts.append(pdf[ts_col].iloc[i])
                out_feat.append(vals[i : i + length].tolist())
            if is_native:
                native_rank += 1
        return pd.DataFrame(
            {"window_id": out_id, "start_ts": out_ts, "features": out_feat}
        )

    return both.groupBy("__bucket").applyInPandas(build, schema)


def sliding_mean(
    df: DataFrame, value_col: str, length: int, ts_col: str = "ts"
) -> DataFrame:
    """Mean of ``value_col`` over each full stride-1 window of ``length`` rows.

    The windowed-scalar core used by scoring (per-window MSE = sliding
    mean of the per-row error — see operators/score.py).  Global-order
    frame variant; day-partitioned overlap variant available via
    :func:`sequence_windows_scalable` composition at scale.
    """
    w_frame = Window.orderBy(ts_col).rowsBetween(0, length - 1)
    w_rank = Window.orderBy(ts_col)
    return (
        df.withColumn("__cnt", F.count(value_col).over(w_frame))
        .withColumn("__avg", F.avg(value_col).over(w_frame))
        .withColumn("window_id", F.row_number().over(w_rank).cast("bigint") - 1)
        .filter(F.col("__cnt") == length)
        .select(
            "window_id",
            F.col(ts_col).alias("start_ts"),
            F.col("__avg").alias(value_col),
        )
    )
