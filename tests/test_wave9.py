"""From-definition pins for the round-6 operators: constructed inputs
with hand-computable truths, independent of the DuckDB oracles."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from prometheus_anomaly_detection_lstm_spark.plans.wave9 import (
    AB_TAU2,
    ESD_LAMBDA,
    ab_sequential,
)

EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double"
)


def _purchases(spark, rows):
    return spark.createDataFrame(pd.DataFrame(rows), EV_SCHEMA)


def _mk_rows(values_by_day, lift):
    """values_by_day: list of per-day base values; variant 1 (odd uid)
    gets +lift."""
    rows, eid = [], 0
    for d, vals in enumerate(values_by_day):
        for i, v in enumerate(vals):
            for uid in (2 * i, 2 * i + 1):
                rows.append(
                    {
                        "event_id": eid,
                        "ts": pd.Timestamp("2024-05-01")
                        + pd.Timedelta(days=d, minutes=i),
                        "user_id": uid,
                        "event_type": "purchase",
                        "value": float(v + (lift if uid % 2 else 0.0)),
                    }
                )
                eid += 1
    return rows


def test_msprt_p_monotone_and_symmetry(spark):
    base = [[10.0, 11.0, 9.5, 10.5]] * 5
    rows = _mk_rows(base, lift=3.0)
    out = ab_sequential(_purchases(spark, rows)).orderBy("day").collect()
    ps = [r.p_always_valid for r in out]
    # always-valid envelope is non-increasing
    assert all(a >= b for a, b in zip(ps, ps[1:]))
    # swapping variants negates delta and leaves the p process intact
    swapped = [dict(r, user_id=r["user_id"] + 1) for r in rows]
    out2 = (
        ab_sequential(_purchases(spark, swapped)).orderBy("day").collect()
    )
    for a, b in zip(out, out2):
        assert a.delta == pytest.approx(-b.delta, abs=1e-9)
        assert a.p_always_valid == pytest.approx(
            b.p_always_valid, abs=1e-9
        )


def test_msprt_matches_scalar_replica(spark):
    """The day-3 readout equals a from-the-formula scalar replica."""
    base = [[10.0, 12.0, 9.0], [11.0, 10.0, 9.5], [10.5, 11.5, 10.0]]
    rows = _mk_rows(base, lift=2.0)
    out = {
        r.day: r
        for r in ab_sequential(_purchases(spark, rows)).collect()
    }
    pdf = pd.DataFrame(rows)
    pdf["day"] = pdf.ts.dt.floor("D")
    p_min = 1.0
    for day in sorted(pdf.day.unique()):
        seen = pdf[pdf.day <= day]
        a = seen[seen.user_id % 2 == 0].value
        b = seen[seen.user_id % 2 == 1].value
        delta = b.mean() - a.mean()
        sp2 = (
            ((a - a.mean()) ** 2).sum() + ((b - b.mean()) ** 2).sum()
        ) / (len(a) + len(b) - 2)
        v = sp2 * (1 / len(a) + 1 / len(b))
        log_lr = 0.5 * math.log(v / (v + AB_TAU2)) + delta**2 * AB_TAU2 / (
            2 * v * (v + AB_TAU2)
        )
        p_min = min(p_min, min(1.0, math.exp(-log_lr)))
        r = out[day.to_pydatetime()]
        assert r.delta == pytest.approx(delta, abs=1e-6)
        assert r.log_lr == pytest.approx(log_lr, abs=1e-6)
        assert r.p_always_valid == pytest.approx(p_min, abs=1e-6)


def test_basket_affinity_hand_computed(spark, tmp_path):
    """4 orders over 3 brands with known co-occurrence: exact lift."""
    from prometheus_anomaly_detection_lstm_spark.plans import wave9

    li = spark.createDataFrame(
        # orders: {1: A,B}, {2: A,B}, {3: A,B,C}, {4: A,C}  (by part)
        [(1, 10), (1, 20), (2, 10), (2, 20), (3, 10), (3, 20), (3, 30),
         (4, 11), (4, 30)],
        "l_orderkey long, l_partkey long",
    )
    part = spark.createDataFrame(
        [(10, "A"), (11, "A"), (20, "B"), (30, "C")],
        "p_partkey long, p_brand string",
    )
    sf = str(tmp_path / "basket_sf")
    li.write.parquet(f"{sf}/lineitem.parquet")
    part.write.parquet(f"{sf}/part.parquet")
    old = wave9.BASKET_MIN_SUPPORT
    wave9.BASKET_MIN_SUPPORT = 1
    try:
        got = {
            (r.brand_a, r.brand_b): r
            for r in wave9.q_orders_basket_affinity(spark, sf).collect()
        }
    finally:
        wave9.BASKET_MIN_SUPPORT = old
    # margins: A in 4 orders, B in 3, C in 2; N=4
    ab = got[("A", "B")]
    assert ab.n_ab == 3
    assert ab.support == pytest.approx(3 / 4)
    assert ab.confidence == pytest.approx(3 / 4)
    assert ab.lift == pytest.approx(3 * 4 / (4 * 3))  # 1.0
    ac = got[("A", "C")]
    assert ac.n_ab == 2
    assert ac.lift == pytest.approx(2 * 4 / (4 * 2))  # 1.0
    bc = got[("B", "C")]
    assert bc.n_ab == 1
    assert bc.lift == pytest.approx(1 * 4 / (3 * 2))


def test_glr_localizes_planted_step(spark, tmp_path):
    """A clean +5 step at a known hour: change_hour == the step hour
    and mean_post - mean_pre ~ 5."""
    from prometheus_anomaly_detection_lstm_spark.plans.wave9 import (
        q_metric_glr_changepoint,
    )

    rng = np.random.default_rng(3)
    rows = []
    step_at = 60
    for h in range(120):
        v = 10.0 + rng.normal(0, 0.3) + (5.0 if h >= step_at else 0.0)
        rows.append(
            {
                "event_id": h,
                "ts": pd.Timestamp("2024-06-01") + pd.Timedelta(hours=h),
                "user_id": 1,
                "event_type": "cpu",
                "value": float(v),
            }
        )
    sf = str(tmp_path / "glr_sf")
    df = spark.createDataFrame(pd.DataFrame(rows), EV_SCHEMA)
    df.write.parquet(f"{sf}/events.parquet")
    out = q_metric_glr_changepoint(spark, sf).collect()
    assert len(out) == 1
    r = out[0]
    assert r.change_hour == (
        pd.Timestamp("2024-06-01") + pd.Timedelta(hours=step_at)
    ).to_pydatetime()
    assert r.mean_post - r.mean_pre == pytest.approx(5.0, abs=0.5)


def test_esd_unmasks_second_outlier(spark, tmp_path):
    """Masking case: TWO huge outliers inflate the single-pass sd so
    the second hides; the iterative rounds surface both."""
    from prometheus_anomaly_detection_lstm_spark.plans.wave9 import (
        q_metric_esd_outliers,
    )

    rng = np.random.default_rng(11)
    vals = list(rng.normal(10, 0.5, 60))
    vals[20] = 60.0
    vals[40] = 55.0
    rows = [
        {
            "event_id": h,
            "ts": pd.Timestamp("2024-06-01") + pd.Timedelta(hours=h),
            "user_id": 1,
            "event_type": "cpu",
            "value": float(v),
        }
        for h, v in enumerate(vals)
    ]
    sf = str(tmp_path / "esd_sf")
    spark.createDataFrame(pd.DataFrame(rows), EV_SCHEMA).write.parquet(
        f"{sf}/events.parquet"
    )
    out = sorted(
        q_metric_esd_outliers(spark, sf).collect(), key=lambda r: r.round
    )
    # single-pass z on the contaminated series: the SECOND outlier's
    # plain z is depressed by the first's pull on mean/sd
    arr = np.array(vals)
    z40 = abs(arr[40] - arr.mean()) / arr.std(ddof=1)
    # rounds 1 and 2 flag the two planted hours, in magnitude order
    assert [r.hour.hour + 24 * (r.hour.day - 1) for r in out[:2]] == [20, 40]
    assert out[0].is_outlier == 1 and out[1].is_outlier == 1
    # round-2 statistic (recomputed WITHOUT the first outlier) exceeds
    # the naive single-pass z of the same point — the unmasking effect
    assert out[1].r_stat > z40
    # later rounds on clean noise fall under the lambda
    assert all(r.is_outlier == 0 for r in out[2:])
    # replica pin: round-2 stat from the definition
    kept = np.delete(arr, 20)
    r2 = abs(55.0 - kept.mean()) / kept.std(ddof=1)
    assert out[1].r_stat == pytest.approx(round(r2, 6), abs=1e-6)


def test_rake_hand_corpus(spark, tmp_path):
    """Tiny corpus with one dominant multi-word phrase: RAKE surfaces
    it with the from-definition score."""
    from prometheus_anomaly_detection_lstm_spark.plans import wave9

    docs = spark.createDataFrame(
        [
            (1, "the deep learning is a breakthrough and the deep "
                "learning is here", "en", "s", 10),
            (2, "a deep learning for the training cost and a training "
                "cost for it", "en", "s", 10),
            (3, "it is deep learning and training cost and models and "
                "models", "en", "s", 10),
        ],
        "doc_id long, text string, lang string, source string, "
        "n_chars long",
    )
    sf = str(tmp_path / "rake_sf")
    docs.write.parquet(f"{sf}/documents.parquet")
    old = wave9.RAKE_MIN_PHRASE_FREQ
    wave9.RAKE_MIN_PHRASE_FREQ = 2
    try:
        got = {
            r.phrase: r for r in wave9.q_text_keyword_extract(spark, sf).collect()
        }
    finally:
        wave9.RAKE_MIN_PHRASE_FREQ = old
    assert "deep learning" in got
    # segmentation: 'deep learning' x4, 'training cost' x3,
    # 'models' x2 (every other candidate is below min freq 2).
    # deep/learning: freq 4, degree 8 -> word score 2 each; phrase
    # score 4.  training/cost: freq 3, degree 6 -> 2 each; score 4.
    # models: freq 2, degree 2 -> score 1.
    assert got["deep learning"].phrase_freq == 4
    assert got["deep learning"].rake_score == pytest.approx(4.0)
    assert got["training cost"].phrase_freq == 3
    assert got["training cost"].rake_score == pytest.approx(4.0)
    assert got["models"].rake_score == pytest.approx(1.0)
    # the dominant multi-word phrases outrank any single word
    single_scores = [
        r.rake_score for p, r in got.items() if " " not in p
    ]
    assert all(
        got["deep learning"].rake_score > s for s in single_scores
    )


def test_ramp_detect_flags_drift_not_control(spark, tmp_path):
    from prometheus_anomaly_detection_lstm_spark.plans.wave9 import (  # noqa: F401
        QUERIES as _W9,
    )
    from prometheus_anomaly_detection_lstm_spark.plans.wave8 import (
        q_metric_ramp_detect,
    )

    rng = np.random.default_rng(5)
    rows, eid = [], 0
    for metric, drift in (("ramp", 0.02), ("flat", 0.0)):
        for h in range(14 * 24):
            base = 100 + 10 * math.sin(h % 24 / 24 * 2 * math.pi)
            v = base + rng.normal(0, 1.0) + drift * h
            rows.append(
                {
                    "event_id": eid,
                    "ts": pd.Timestamp("2024-06-01")
                    + pd.Timedelta(hours=h),
                    "user_id": 1,
                    "event_type": metric,
                    "value": float(v),
                }
            )
            eid += 1
    sf = str(tmp_path / "ramp_sf")
    spark.createDataFrame(pd.DataFrame(rows), EV_SCHEMA).write.parquet(
        f"{sf}/events.parquet"
    )
    out = {r.metric: r for r in q_metric_ramp_detect(spark, sf).collect()}
    assert out["ramp"].drifting == 1
    assert out["flat"].drifting == 0
    assert out["ramp"].slope_per_hour == pytest.approx(0.02, abs=0.01)
