"""Holt smoothing fold vs the naive two-state recursion, and seasonal
anomaly soundness vs a pandas profile oracle."""

from __future__ import annotations

import datetime

import numpy as np
import pandas as pd
from hypothesis import given, settings, strategies as st

from prometheus_anomaly_detection_lstm_spark.io_tables import load_table
from prometheus_anomaly_detection_lstm_spark.operators.promql import (
    HOLT_ALPHA,
    HOLT_BETA,
    HOLT_K,
    SEASONAL_Z,
    holt_smoothing,
    seasonal_anomaly,
)

from .conftest import SF_SMALL

values = st.lists(
    st.floats(min_value=-1e4, max_value=1e4, allow_nan=False,
              allow_infinity=False),
    min_size=1,
    max_size=40,
)


def _naive_holt(window_vals, alpha, beta):
    """Reference recursion over ONE truncated window."""
    s, b = window_vals[0], 0.0
    for x in window_vals[1:]:
        s2 = alpha * x + (1 - alpha) * (s + b)
        b = beta * (s2 - s) + (1 - beta) * b
        s = s2
    return s, b


@settings(max_examples=10, deadline=None)
@given(vals=values)
def test_holt_fold_matches_naive_recursion(spark, vals):
    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (t0 + datetime.timedelta(minutes=i), "m", float(v), i)
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(
        rows, "ts timestamp, metric string, value double, seq long"
    )
    got = {
        r["seq"]: (r["level"], r["trend"])
        for r in holt_smoothing(df, k=8).collect()
    }
    for i in range(len(vals)):
        window = vals[max(0, i - 7): i + 1]
        s, b = _naive_holt(window, HOLT_ALPHA, HOLT_BETA)
        # compare against the UNROUNDED recursion with a half-ulp-of-
        # round(.,6) tolerance: Python's round() is banker's, Spark's is
        # half-up, so an exact tie at the 7th decimal (hypothesis found
        # 0.0962835) differs by exactly 5e-7 between the two roundings.
        assert abs(got[i][0] - s) < 5.01e-7, (i, got[i], s)
        assert abs(got[i][1] - b) < 5.01e-7, (i, got[i], b)


def test_holt_partition_split_invariant(spark):
    ev = load_table(spark, SF_SMALL, "events").select(
        "ts", "event_type", "value", "event_id"
    ).withColumnRenamed("event_type", "metric").withColumnRenamed(
        "event_id", "seq"
    )
    a = sorted(
        (r["seq"], r["level"], r["trend"])
        for r in holt_smoothing(ev.repartition(2)).collect()
    )
    b = sorted(
        (r["seq"], r["level"], r["trend"])
        for r in holt_smoothing(ev.repartition(13)).collect()
    )
    assert a == b


def test_seasonal_anomaly_matches_pandas(spark):
    ev = load_table(spark, SF_SMALL, "events").select(
        "ts", "event_type", "value", "event_id"
    ).withColumnRenamed("event_type", "metric").withColumnRenamed(
        "event_id", "seq"
    )
    pdf = ev.toPandas()
    pdf["h"] = pdf["ts"].dt.hour
    g = pdf.groupby(["metric", "h"])["value"]
    m = g.transform("mean")
    s = g.transform(lambda v: v.std(ddof=0))
    z = (pdf["value"] - m) / s.replace(0, np.nan)
    want = set(pdf.loc[z.abs() >= SEASONAL_Z, "seq"].tolist())
    got = {r["seq"] for r in seasonal_anomaly(ev).collect()}
    assert got == want
