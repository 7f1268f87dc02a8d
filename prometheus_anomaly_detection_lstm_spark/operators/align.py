"""Alignment core: long->wide pivot, dedup, unions, backfill, ordering.

Re-expresses the reference's collector alignment (SURVEY §2.3/§2.4):

* J1  N-way full-outer align on timestamp  (data_collector.py:108)
* J2  N-way inner align                    (realtime_detector.py:195)
* U1/U2 vertical unions                    (data_collector.py:118,222)
* U3  dedup on timestamp keep-FIRST        (data_collector.py:120,223-224)
* U4  sort by timestamp                    (data_collector.py:127)
* U5  tail-N by recency                    (realtime_detector.py:210)
* P6  missing-column backfill              (data_collector.py:122-125)
* S4  multi-series collapse: keep first    (data_collector.py:71-75)

Scale notes: the pivot is ONE shuffle keyed by the (dense, evenly
distributed) time grid — no skew, no driver loop, and `min_by` fuses the
keep-first dedup into the pivot aggregation itself so alignment + dedup
is a single exchange.  An iterative per-metric full-outer join would be
N-1 shuffles; the pivot is N-stable.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def metrics_wide(
    long_df: DataFrame,
    metrics: list[str],
    *,
    ts_col: str = "ts",
    metric_col: str = "metric",
    value_col: str = "value",
    order_col: str = "seq",
    step: str | None = "minute",
) -> DataFrame:
    """Long (ts, metric, value, provenance) -> wide one-column-per-metric.

    Full-outer alignment on the timestamp (J1): the output timestamp set
    is the union over metrics, NULL where a metric has no sample — the
    Spark equivalent of ``pd.concat(axis=1, join='outer')``.

    Keep-first dedup (U3) is fused in via ``min_by(value, order_col)``:
    when a (ts, metric) pair has several samples the one with the lowest
    provenance order wins, matching the reference's
    ``~index.duplicated(keep='first')`` with chunk/period provenance
    (SURVEY H4).  One shuffle total.
    """
    ts = F.date_trunc(step, F.col(ts_col)) if step else F.col(ts_col)
    keep_first = F.expr(f"min_by({value_col}, {order_col})")
    return (
        long_df.withColumn("__ts", ts)
        .groupBy(F.col("__ts").alias(ts_col))
        .pivot(metric_col, metrics)
        .agg(keep_first)
    )


def metrics_wide_day_partitioned(
    long_df: DataFrame,
    metrics: list[str],
    *,
    ts_col: str = "ts",
    metric_col: str = "metric",
    value_col: str = "value",
    order_col: str = "seq",
    step: str | None = "minute",
    day_col: str = "__day",
) -> DataFrame:
    """:func:`metrics_wide` fused onto a day-hash exchange.

    The long frame is repartitioned by calendar day ONCE; the pivot
    then groups by ``(day, ts)`` whose ClusteredDistribution is already
    satisfied by the day hash (same day => same partition), so the
    pivot aggregation runs exchange-free — and every downstream
    day-keyed operator (``ffill_bfill_scalable``'s summary aggregate
    and per-row fill window, ``window_mse``'s day buckets) reuses the
    SAME exchange.  The whole align->fill->scale->window->score chain
    costs one full-data shuffle.

    Output rows/values are identical to :func:`metrics_wide` plus the
    ``day_col`` column (day = to_date(ts) is functionally dependent on
    the group key, so the extra grouping column changes nothing).
    Scale note: parallelism within a day comes from AQE splitting is
    NOT possible on a hash partition, so this variant assumes day
    volume fits an executor's task (the same day-bucket premise as the
    fill/window operators); for hot single days use the unfused
    :func:`metrics_wide` whose per-``ts`` hash spreads freely.
    """
    ts = F.date_trunc(step, F.col(ts_col)) if step else F.col(ts_col)
    keep_first = F.expr(f"min_by({value_col}, {order_col})")
    return (
        long_df.withColumn("__ts", ts)
        .withColumn(day_col, F.to_date("__ts"))
        .repartition(F.col(day_col))
        .groupBy(day_col, F.col("__ts").alias(ts_col))
        .pivot(metric_col, metrics)
        .agg(keep_first)
    )


def inner_align(wide_df: DataFrame, metric_cols: list[str]) -> DataFrame:
    """J2: keep only timestamps where EVERY metric has a sample.

    The realtime detector's ``pd.concat(axis=1, join='inner')``
    (realtime_detector.py:195) — intersection of per-metric timestamp
    sets == rows of the outer-aligned frame with no NULL metric.
    """
    return wide_df.na.drop(subset=metric_cols)


def dedup_keep_first(
    df: DataFrame, key_cols: list[str], order_cols: list[str]
) -> DataFrame:
    """U3: one row per key, first in provenance order (deterministic).

    Reference: ``df[~df.index.duplicated(keep='first')]``
    (data_collector.py:120, :224).  Provenance ordering columns make the
    choice deterministic under Spark's unordered execution (SURVEY H4).
    """
    w = Window.partitionBy(*key_cols).orderBy(*[F.col(c).asc() for c in order_cols])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def union_periods(dfs: list[DataFrame]) -> DataFrame:
    """U1/U2: vertical union of same-schema chunks/periods."""
    return reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), dfs)


def backfill_missing_columns(df: DataFrame, expected: list[str]) -> DataFrame:
    """P6: absent metric -> all-NULL double column, stable schema.

    Reference: data_collector.py:122-125 (``pd.NA`` backfill).
    """
    out = df
    for c in expected:
        if c not in df.columns:
            out = out.withColumn(c, F.lit(None).cast("double"))
    return out


def tail_n(df: DataFrame, n: int, ts_col: str = "ts") -> DataFrame:
    """U5: last n rows by timestamp, returned in ascending order.

    Reference: ``aligned.tail(L)`` (realtime_detector.py:210).  The
    descending limit-n is a TakeOrderedAndProject (no full sort / single
    global shuffle of the whole table) — scalable top-k.
    """
    return df.orderBy(F.col(ts_col).desc()).limit(n).orderBy(F.col(ts_col).asc())


def first_series(
    df: DataFrame,
    group_cols: list[str],
    series_col: str,
) -> DataFrame:
    """S4: when a query returns multiple series keep the FIRST series.

    Reference: data_collector.py:71-75 (warn + take ``result[0]``).
    "First" = lowest series index in response order; rows of all other
    series are discarded.
    """
    w = Window.partitionBy(*group_cols)
    return (
        df.withColumn("__min_series", F.min(series_col).over(w))
        .filter(F.col(series_col) == F.col("__min_series"))
        .drop("__min_series")
    )
