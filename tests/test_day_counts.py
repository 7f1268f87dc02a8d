"""day_counts injection (round 11): the bucketing summary computed
from a shallow source must be EXACTLY the frame the deep chain would
derive — offsets, ranks, coverage and therefore every window id and
value identical."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

import prometheus_anomaly_detection_lstm_spark.plans.pipeline as P
from prometheus_anomaly_detection_lstm_spark.operators import score

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.01")


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_pivot_day_counts_matches_prep_distribution(spark):
    dc = _rows(P.pivot_day_counts(spark, SF))
    prep = P.preprocessed(spark, SF, keep_day=True)
    derived = _rows(
        prep.groupBy("__day").agg(F.count("*").alias("__n"))
    )
    assert dc == derived


def test_day_counts_window_mse_equals_derived(spark):
    prep = P.preprocessed(spark, SF, keep_day=True)
    with_dc = score.window_mse(
        prep, P.FEATURES, P.SEQUENCE_LENGTH, a=P.STUB_A, b=P.STUB_B,
        day_col="__day", day_counts=P.pivot_day_counts(spark, SF),
    )
    without = score.window_mse(
        prep, P.FEATURES, P.SEQUENCE_LENGTH, a=P.STUB_A, b=P.STUB_B,
        day_col="__day",
    )
    assert _rows(with_dc) == _rows(without)


def test_anomaly_scores_scan_count_shrinks(spark):
    """The point of the injection: the executed flagship plan should
    re-scan the events parquet far fewer times than the 16 the
    recompute shape paid (the summary subtrees' rebuilds collapse to
    shallow scan+agg)."""
    plan = P.anomaly_scores(spark, SF)._jdf.queryExecution().executedPlan().toString()
    scans = plan.count("Scan parquet")
    assert scans <= 10, f"{scans} parquet scans in the flagship plan"
