"""Streaming spectral-residual saliency: exactly-once day-chunk alerts.

The serving-time half of plans/wave8.spectral_residual_anomalies: every
finalized event-time day emits the hours whose SR saliency exceeds the
threshold — the model-free twin of the LSTM detector's streaming scorer
(streaming/detector.py), needing no trained artifact at all.

Structured-Streaming shape: the day chunk is assembled by the SAME
single-aggregate trick as streaming/sax (24 conditional hourly means as
columns of ONE 1-day-window aggregate — two chained aggs are illegal in
append mode); the FFT then runs in an Arrow-vectorized pandas UDF over
the assembled 24-slot array (one batch row per finalized (series, day),
so the Python cost is per-DAY, not per-sample), returning the per-hour
saliency scores that a post-projection explodes and thresholds.
Append mode + watermark give exactly-once alerts with bounded state
(#series x open days x 24 doubles).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..plans.wave8 import SR_EPS, SR_THRESHOLD, sr_saliency


def _sr_scores_fn(chunks: pd.Series) -> pd.Series:
    """Relative-saliency scores per 24-slot hourly-mean array (NULL
    slots = absent hours, skipped exactly like the batch operator's
    present-hours-only chunk; scores land back in their slots)."""
    out = []
    for slots in chunks:
        arr = np.asarray(slots, dtype="float64")
        present = ~np.isnan(arr)
        scores = np.full(len(arr), np.nan)
        if present.any():
            sal = sr_saliency(arr[present])
            med = np.median(sal)
            scores[present] = np.round(
                (sal - med) / (med + SR_EPS), 6
            )
        # absent slots as SQL NULL, not NaN: Spark orders NaN above
        # every number, so a NaN score would PASS the > threshold
        # filter and alert on hours that never happened
        out.append(
            [None if np.isnan(v) else float(v) for v in scores]
        )
    return pd.Series(out)


def _sr_scores():
    """Decorate lazily: pandas_udf parses the DDL return type against
    the ACTIVE session, which need not exist at module import."""
    return pandas_udf("array<double>")(_sr_scores_fn)


def streaming_spectral_residual(
    stream: DataFrame, threshold: float = SR_THRESHOLD, watermark: str = "1 hour"
) -> DataFrame:
    """Saliency alerts (metric, day, hr, hourly_value, saliency_score)
    from a stream of (metric, ts, value) rows."""
    hourly = [
        F.avg(F.when(F.hour("ts") == h, F.col("value"))).alias(f"__h{h}")
        for h in range(24)
    ]
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy("metric", F.window("ts", "1 day").alias("w"))
        .agg(*hourly)
    )
    slots = F.array(*[F.col(f"__h{h}").cast("double") for h in range(24)])
    scored = agg.select(
        "metric",
        F.col("w.start").alias("day"),
        slots.alias("__slots"),
        _sr_scores()(slots).alias("__scores"),
    )
    exploded = scored.select(
        "metric",
        "day",
        F.posexplode("__scores").alias("hr", "saliency_score"),
        F.col("__slots"),
    ).withColumn("hourly_value", F.expr("__slots[hr]"))
    return exploded.filter(
        F.col("saliency_score") > threshold
    ).select("metric", "day", "hr", "hourly_value", "saliency_score")
