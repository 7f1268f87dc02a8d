"""PromQL operator semantics on a hand-computed counter stream."""

from __future__ import annotations

import datetime as dt

import pytest

from prometheus_anomaly_detection_lstm_spark.operators import promql


def _ts(minute: int, second: int = 0):
    return dt.datetime(2024, 1, 1, 0, minute, second)


@pytest.fixture(scope="module")
def counter_df(spark):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # one series: counter climbs, resets at t=12m (50 -> 3), climbs on.
    rows = [
        (_ts(1), "c", 10.0, 1),
        (_ts(4), "c", 25.0, 2),
        (_ts(8), "c", 50.0, 3),   # bucket 0 ends at 10m
        (_ts(12), "c", 3.0, 4),   # RESET: increase contribution = 3
        (_ts(14), "c", 9.0, 5),
        (_ts(18), "c", 21.0, 6),  # bucket 1: 10m..20m
    ]
    return spark.createDataFrame(rows, "ts timestamp_ntz, metric string, value double, seq long")


def test_counter_rate_reset_semantics(counter_df):
    out = {
        r["w_start"].minute: r
        for r in promql.counter_rate(counter_df).collect()
    }
    b0, b1 = out[0], out[10]
    # bucket 0: first sample has no predecessor (NULL inc), 10->25->50
    assert b0["n_samples"] == 3 and b0["n_resets"] == 0
    assert b0["increase"] == pytest.approx(40.0)
    assert b0["rate_per_s"] == pytest.approx(40.0 / 600, abs=1e-6)
    # irate: last delta in bucket = (50-25)/(4 min)
    assert b0["irate_per_s"] == pytest.approx(25.0 / 240, abs=1e-6)
    # bucket 1: reset sample contributes its own value (3), then 6, 12
    assert b1["n_samples"] == 3 and b1["n_resets"] == 1
    assert b1["increase"] == pytest.approx(3.0 + 6.0 + 12.0)
    assert b1["irate_per_s"] == pytest.approx(12.0 / 240, abs=1e-6)


def test_gauge_over_time_delta_and_p95(counter_df):
    out = {
        r["w_start"].minute: r
        for r in promql.gauge_over_time(counter_df).collect()
    }
    b0 = out[0]
    assert b0["min_v"] == 10.0 and b0["max_v"] == 50.0
    assert b0["delta_v"] == pytest.approx(50.0 - 10.0)
    # exact interpolated p95 of [10, 25, 50]: 0.95*(n-1)=1.9 -> 25 + 0.9*25
    assert b0["p95_v"] == pytest.approx(25 + 0.9 * 25)


def test_counter_rate_series_isolation(spark):
    """Deltas never cross series: two interleaved series each keep
    their own lag chain."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    rows = [
        (_ts(1), "a", 100.0, 1),
        (_ts(2), "b", 5.0, 2),
        (_ts(3), "a", 130.0, 3),
        (_ts(4), "b", 6.0, 4),
    ]
    df = spark.createDataFrame(
        rows, "ts timestamp_ntz, metric string, value double, seq long"
    )
    out = {r["metric"]: r for r in promql.counter_rate(df).collect()}
    assert out["a"]["increase"] == pytest.approx(30.0)
    assert out["b"]["increase"] == pytest.approx(1.0)
    assert out["a"]["n_resets"] == 0 and out["b"]["n_resets"] == 0


def test_histogram_quantile_interpolation(spark):
    """Hand-computed PromQL estimator: crossing slot interpolates
    linearly; +Inf crossing returns the highest finite boundary."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # metric 'x': 10 samples -> buckets (<=10): 4, (10,25]: 4, rest 2.
    rows = [(_ts(0, i), "x", v, i) for i, v in enumerate(
        [1.0, 2.0, 3.0, 4.0, 12.0, 13.0, 14.0, 15.0, 30.0, 60.0]
    )]
    # metric 'inf': everything beyond the last finite boundary
    rows += [(_ts(0, 20 + i), "inf", 400.0, 100 + i) for i in range(3)]
    df = spark.createDataFrame(
        rows, "ts timestamp_ntz, metric string, value double, seq long"
    )
    out = {r["metric"]: r for r in promql.histogram_quantile(df, q=0.5).collect()}
    # rank = 5.0; cum after slot0 = 4, slot1 crosses (cum 8):
    # est = 10 + (25-10) * (5-4)/4 = 13.75
    assert out["x"]["p50_est"] == pytest.approx(13.75, abs=1e-6)
    assert out["x"]["n_samples"] == 10
    # all mass in +Inf slot -> highest finite le
    assert out["inf"]["p50_est"] == pytest.approx(promql.LE[-1])


def test_frequent_tokens_partitioning_independent(spark):
    """The sketch pass emits different candidate sets under different
    partitionings; the exact recount must erase that difference."""
    from prometheus_anomaly_detection_lstm_spark.operators import text
    from .conftest import SF_SMALL
    from prometheus_anomaly_detection_lstm_spark.io_tables import load_table

    docs = load_table(spark, SF_SMALL, "documents")
    one = {
        (r["token"], r["cnt"])
        for r in text.frequent_tokens(docs.repartition(1)).collect()
    }
    many = {
        (r["token"], r["cnt"])
        for r in text.frequent_tokens(docs.repartition(17)).collect()
    }
    assert one == many and len(one) > 0


def test_embedding_covariance_matches_numpy(spark):
    """The partial-outer-product merge equals np.cov(bias=True) on the
    collected corpus, and is symmetric by construction."""
    import numpy as np

    from prometheus_anomaly_detection_lstm_spark.io_tables import load_table
    from prometheus_anomaly_detection_lstm_spark.operators import linalg
    from .conftest import SF_SMALL

    emb = load_table(spark, SF_SMALL, "embeddings")
    rows = linalg.embedding_covariance(emb).collect()
    d = linalg.DIM
    got = np.zeros((d, d))
    for r in rows:
        got[r["i"] - 1, r["j"] - 1] = r["cov"]
    x = np.stack(
        [np.asarray(r["embedding"], dtype=np.float64) for r in emb.collect()]
    )
    want = np.cov(x, rowvar=False, bias=True)
    assert np.allclose(got, want, atol=5e-7)  # 6-dp rounding tolerance
    assert np.array_equal(got, got.T)


def test_pca_fit_project_properties(spark):
    """PCA on the distributed covariance: orthonormal components,
    descending eigenvalues, and the projected coordinates' empirical
    variances equal the eigenvalues (the defining PCA property)."""
    import numpy as np

    from prometheus_anomaly_detection_lstm_spark.io_tables import load_table
    from prometheus_anomaly_detection_lstm_spark.operators import linalg
    from .conftest import SF_SMALL

    emb = load_table(spark, SF_SMALL, "embeddings")
    comps, vals, mean = linalg.pca_fit(emb, k=4)
    assert np.allclose(comps @ comps.T, np.eye(4), atol=1e-8)
    assert all(vals[i] >= vals[i + 1] for i in range(3))
    proj = linalg.pca_project(emb, comps, mean).toPandas()
    got_var = proj[[f"pc_{r}" for r in range(1, 5)]].to_numpy().var(axis=0)
    assert np.allclose(got_var, vals, rtol=1e-3)


SAMPLE_SCHEMA = "ts timestamp_ntz, metric string, value double, seq long"


def test_promql_ops_on_empty_and_singleton_input(spark):
    """Empty stream -> empty frames; a single sample -> one bucket with
    NULL increase/rate (no predecessor) and a well-defined gauge row."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    empty = spark.createDataFrame([], SAMPLE_SCHEMA)
    assert promql.counter_rate(empty).count() == 0
    assert promql.gauge_over_time(empty).count() == 0
    assert promql.histogram_quantile(empty).count() == 0

    one = spark.createDataFrame([(_ts(1), "m", 7.0, 1)], SAMPLE_SCHEMA)
    r = promql.counter_rate(one).collect()
    assert len(r) == 1 and r[0]["increase"] is None and r[0]["n_resets"] == 0
    g = promql.gauge_over_time(one).collect()
    assert g[0]["delta_v"] == 0.0 and g[0]["p95_v"] == 7.0
    h = promql.histogram_quantile(one).collect()
    assert len(h) == 1 and h[0]["n_samples"] == 1


def test_frequent_tokens_empty_corpus(spark):
    from prometheus_anomaly_detection_lstm_spark.operators import text

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert text.frequent_tokens(empty).count() == 0


def test_embedding_covariance_empty(spark):
    from prometheus_anomaly_detection_lstm_spark.operators import linalg

    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert linalg.embedding_covariance(empty).count() == 0


def test_hot_series_counter_rate_equals_plain(spark):
    """The day-bucketed carry variant (hot_series=True) must be
    answer-identical to the per-series lag window — multi-day single hot
    series with mid-stream resets, plus a second sparse series, plus the
    real events stream at sf0.001 (round-3 verdict task 6)."""
    import datetime as dt

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    rows = []
    v, seq = 0.0, 0
    # hot series: 3 days x 200 samples, resets every 77 samples
    for day in range(3):
        for i in range(200):
            seq += 1
            v = 1.0 if seq % 77 == 0 else v + (seq % 5) + 0.25
            rows.append(
                (
                    dt.datetime(2024, 1, 1 + day, i // 60, i % 60, 30),
                    "hot",
                    v,
                    seq,
                )
            )
    # sparse series: one sample per day (every lag crosses midnight)
    for day in range(3):
        seq += 1
        rows.append((dt.datetime(2024, 1, 1 + day, 12, 0, 0), "sparse", float(day * 10), seq))
    df = spark.createDataFrame(
        rows, "ts timestamp_ntz, metric string, value double, seq long"
    )

    def key(frame):
        return sorted(
            (tuple(r) for r in frame.collect()),
            key=lambda t: (t[0], str(t[1])),
        )

    plain = promql.counter_rate(df)
    hot = promql.counter_rate(df, hot_series=True)
    assert key(plain) == key(hot)

    # and on the real sample stream
    from .conftest import SF_SMALL

    samples = promql._long(spark, SF_SMALL)
    assert key(promql.counter_rate(samples)) == key(
        promql.counter_rate(samples, hot_series=True)
    )


def test_hot_series_parallelism_grows_with_days(spark):
    """The hot path's full-data lag window is partitioned by
    (series, day) — a single giant series no longer serializes: the
    plan's WindowExec partition spec must include the day column."""
    import datetime as dt

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    rows = [
        (dt.datetime(2024, 1, 1 + d, 0, 0, 0), "only", float(d), d)
        for d in range(5)
    ]
    df = spark.createDataFrame(
        rows, "ts timestamp_ntz, metric string, value double, seq long"
    )
    plan = promql.counter_rate(df, hot_series=True)._jdf.queryExecution().executedPlan().toString()
    assert "__pday" in plan  # day key present in the window/exchange spec


def test_ridge_fit_matches_numpy(spark):
    """Distributed normal-equation ridge == numpy closed form."""
    import numpy as np

    from prometheus_anomaly_detection_lstm_spark.operators import linalg
    from prometheus_anomaly_detection_lstm_spark.io_tables import load_table

    from .conftest import SF_SMALL

    emb = load_table(spark, SF_SMALL, "embeddings")
    got = np.array(
        [
            r["weight"]
            for r in linalg.ridge_fit(emb).orderBy("dim").collect()
        ]
    )
    pdf = emb.select("embedding", "label").toPandas()
    x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    x = np.hstack([np.ones((x.shape[0], 1)), x])
    y = pdf["label"].to_numpy(dtype=np.float64)
    want = np.linalg.solve(
        x.T @ x + linalg.RIDGE_LAMBDA * np.eye(x.shape[1]), x.T @ y
    )
    assert np.allclose(got, np.round(want, 6), atol=2e-6)
    # the probe is non-trivial: some coefficient moves off zero
    assert np.abs(got[1:]).max() > 1e-4


def test_ridge_fit_partitioning_invariant(spark):
    import numpy as np

    from prometheus_anomaly_detection_lstm_spark.operators import linalg
    from prometheus_anomaly_detection_lstm_spark.io_tables import load_table

    from .conftest import SF_SMALL

    emb = load_table(spark, SF_SMALL, "embeddings")
    a = [r["weight"] for r in
         linalg.ridge_fit(emb.repartition(1)).orderBy("dim").collect()]
    b = [r["weight"] for r in
         linalg.ridge_fit(emb.repartition(13)).orderBy("dim").collect()]
    assert np.allclose(a, b, atol=2e-6)


def test_whitened_embeddings_have_identity_covariance(spark):
    """PCA-whitening contract: unit variance on every kept component,
    zero cross-covariance (population, matching the covariance op)."""
    import numpy as np

    from prometheus_anomaly_detection_lstm_spark.io_tables import load_table
    from prometheus_anomaly_detection_lstm_spark.operators import linalg

    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    comps, vals, mean = linalg.pca_fit(emb, k=6)
    out = linalg.whiten_project(emb, comps, vals, mean).toPandas()
    w = out[[f"wh_{r}" for r in range(1, 7)]].to_numpy()
    cov = np.cov(w, rowvar=False, bias=True)
    assert np.allclose(np.diag(cov), 1.0, atol=1e-3)
    off = cov - np.diag(np.diag(cov))
    assert np.abs(off).max() < 1e-3


def test_vector_match_ratio_zero_denominator_and_match_semantics(spark):
    """PromQL vector matching: inner-join semantics (no match -> no
    row) and NULL on a zero denominator."""
    import datetime as dt

    from prometheus_anomaly_detection_lstm_spark.operators.promql import (
        vector_match_ratio,
    )

    TS = dt.datetime
    rows = [
        # bucket 10:00: error increases 12, click increases 24 -> 0.5
        # (both increments divide the 600 s bucket exactly, so the
        # pre-rounded rates are exact and the ratio is exactly 0.5)
        ("error", TS(2024, 1, 1, 10, 0, 0), 0.0, 1),
        ("error", TS(2024, 1, 1, 10, 5, 0), 12.0, 2),
        ("click", TS(2024, 1, 1, 10, 0, 0), 0.0, 3),
        ("click", TS(2024, 1, 1, 10, 5, 0), 24.0, 4),
        # bucket 10:10: click flat (denominator 0) -> NULL ratio
        ("error", TS(2024, 1, 1, 10, 10, 0), 15.0, 5),
        ("error", TS(2024, 1, 1, 10, 15, 0), 21.0, 6),
        ("click", TS(2024, 1, 1, 10, 10, 0), 24.0, 7),
        ("click", TS(2024, 1, 1, 10, 15, 0), 24.0, 8),
        # bucket 10:20: error only -> NO row (inner join)
        ("error", TS(2024, 1, 1, 10, 20, 0), 30.0, 9),
    ]
    s = spark.createDataFrame(
        rows, "metric string, ts timestamp_ntz, value double, seq long"
    )
    out = {
        r["w_start"].strftime("%H:%M"): r
        for r in vector_match_ratio(s).collect()
    }
    assert out["10:00"]["ratio"] == 0.5
    assert out["10:10"]["ratio"] is None
    assert "10:20" not in out


def test_logreg_fit_matches_numpy(spark):
    """Distributed full-batch GD == the identical numpy schedule."""
    import numpy as np

    from prometheus_anomaly_detection_lstm_spark.operators import linalg
    from prometheus_anomaly_detection_lstm_spark.io_tables import load_table
    from pyspark.sql import functions as F

    from .conftest import SF_SMALL

    emb = load_table(spark, SF_SMALL, "embeddings").select(
        "embedding", (F.col("label") == 0).cast("double").alias("y")
    )
    got_w, got_losses = linalg.logreg_fit(emb)

    pdf = emb.toPandas()
    x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    x = np.hstack([np.ones((x.shape[0], 1)), x])
    y = pdf["y"].to_numpy(dtype=np.float64)
    w = np.zeros(x.shape[1])
    losses = []
    for _ in range(linalg.LOGREG_ITERS):
        z = x @ w
        p = 1.0 / (1.0 + np.exp(-z))
        losses.append(
            float(np.mean(np.log1p(np.exp(-np.abs(z))) + np.maximum(z, 0) - z * y))
        )
        w = w - linalg.LOGREG_LR * (
            x.T @ (p - y) / len(y) + linalg.LOGREG_LAMBDA * w
        )
    assert np.allclose(got_w, w, rtol=1e-7, atol=1e-9)
    assert np.allclose(got_losses, losses, rtol=1e-7)
    # the probe learns something: loss decreases materially from ln(2)
    assert got_losses[-1] < 0.95 * got_losses[0]


def test_logreg_fit_partitioning_invariant(spark):
    import numpy as np

    from prometheus_anomaly_detection_lstm_spark.operators import linalg
    from prometheus_anomaly_detection_lstm_spark.io_tables import load_table
    from pyspark.sql import functions as F

    from .conftest import SF_SMALL

    emb = load_table(spark, SF_SMALL, "embeddings").select(
        "embedding", (F.col("label") == 0).cast("double").alias("y")
    )
    a, _ = linalg.logreg_fit(emb.repartition(1), iters=5)
    b, _ = linalg.logreg_fit(emb.repartition(13), iters=5)
    assert np.allclose(a, b, rtol=1e-9, atol=1e-12)
