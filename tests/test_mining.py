"""Semantic pins for plans/mining (rolling median, change points,
triangle counting, curriculum buckets).

The oracle-parity sweep already hash-checks every entry against DuckDB
at the graded scale; these tests pin the SEMANTICS on hand-built inputs
where the expected answer is computable by eye, so an oracle-and-engine
shared mistake can't stay green."""

from __future__ import annotations

import datetime as dt

from prometheus_anomaly_detection_lstm_spark.plans import mining

from .conftest import SF_SMALL


def _events(spark, rows):
    """rows: (user_id, seconds, event_type, value) -> events-shaped df."""
    base = dt.datetime(2024, 1, 1)
    return spark.createDataFrame(
        [
            (i, base + dt.timedelta(seconds=s), u, t, float(v), "{}")
            for i, (u, s, t, v) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )


def test_triangles_hand_graph(spark, tmp_path):
    # Path a-b-c-a plus pendant d: exactly one triangle {a,b,c}.
    rows = [
        (1, 0, "a", 0), (1, 1, "b", 0), (1, 2, "c", 0), (1, 3, "a", 0),
        (2, 0, "c", 0), (2, 1, "d", 0),
    ]
    p = str(tmp_path / "events.parquet")
    _events(spark, rows).write.mode("overwrite").parquet(p)
    out = {
        r["node"]: r["n_triangles"]
        for r in mining.q_event_graph_triangles(
            spark, str(tmp_path)
        ).collect()
    }
    assert out == {"a": 1, "b": 1, "c": 1}


def test_triangles_orientation_independent(spark):
    """Degree-oriented Spark count == lexical-oriented oracle count on
    the real table (same invariant the hash gate checks, pinned here as
    an explicit set comparison at the test scale)."""
    out = {
        (r["node"], r["n_triangles"])
        for r in mining.q_event_graph_triangles(spark, SF_SMALL).collect()
    }
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"'{SF_SMALL}/events.parquet'"
    )
    ora = set(con.sql(mining.ORACLE_TRIANGLES).fetchall())
    assert out == ora and out


def test_change_points_require_full_windows(spark, tmp_path):
    # A hard level shift exactly at sample 16 of 32: the only full
    # pre+post alignment flags at the jump; series edges stay silent.
    rows = [(1, s, "m", 0.0 if s < 16 else 10.0) for s in range(32)]
    p = str(tmp_path / "events.parquet")
    _events(spark, rows).write.mode("overwrite").parquet(p)
    out = mining.q_metric_change_points(spark, str(tmp_path)).collect()
    assert len(out) == 1
    (r,) = out
    assert r["seq"] == 16  # event_id of the first post-shift sample
    assert r["shift_z"] == 2.0  # (10-0)/5.0 population stddev


def test_rolling_median_matches_unwindowed_prefix(spark, tmp_path):
    # First rows of a series: frame is the whole prefix, so the rolling
    # median equals the plain median of everything seen so far.
    vals = [5.0, 1.0, 9.0, 3.0]
    rows = [(1, s, "m", v) for s, v in enumerate(vals)]
    _events(spark, rows).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    out = [
        r["roll_median"]
        for r in mining.q_metric_rolling_median(spark, str(tmp_path))
        .orderBy("seq")
        .collect()
    ]
    assert out == [5.0, 3.0, 5.0, 4.0]


def test_acf_lag1_near_one_for_smooth_series(spark, tmp_path):
    # A slow ramp is maximally autocorrelated; white-ish alternation is
    # strongly negative at lag 1.
    rows = [(1, s, "ramp", s) for s in range(64)] + [
        (1, s, "alt", 1.0 if s % 2 else -1.0) for s in range(64)
    ]
    _events(spark, rows).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    out = {
        (r["metric"], r["lag"]): r["acf"]
        for r in mining.q_metric_autocorrelation(
            spark, str(tmp_path)
        ).collect()
    }
    assert out[("ramp", 1)] > 0.99
    assert out[("alt", 1)] == -1.0
    assert out[("alt", 2)] == 1.0
    assert len(out) == 2 * mining.ACF_LAGS


def test_mad_flags_planted_spike_mean_z_would_share(spark, tmp_path):
    # 63 calm samples + one 1000x spike: MAD flags exactly the spike.
    rows = [(1, s, "m", float(s % 7)) for s in range(63)] + [(1, 63, "m", 3000.0)]
    _events(spark, rows).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    out = mining.q_metric_mad_outliers(spark, str(tmp_path)).collect()
    assert [r["seq"] for r in out] == [63]


def test_stl_components_reassemble_the_series(spark):
    out = mining.q_metric_stl_decompose(spark, SF_SMALL)
    import duckdb

    ev = duckdb.sql(
        f"SELECT event_id, value FROM '{SF_SMALL}/events.parquet'"
    ).fetchall()
    values = dict(ev)
    rows = out.collect()
    assert rows
    for r in rows[:200]:
        assert (
            abs(r["trend"] + r["seasonal"] + r["residual"] - values[r["seq"]])
            < 2e-6
        )


def test_m4_preserves_extremes_and_endpoints(spark, tmp_path):
    # One series, one hour bucket: first/last by time, min/max by value.
    vals = [(0, 5.0), (60, 1.0), (120, 9.0), (180, 7.0)]
    rows = [(1, s, "m", v) for s, v in vals]
    _events(spark, rows).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    (r,) = mining.q_metric_m4_downsample(spark, str(tmp_path)).collect()
    assert (r["first_v"], r["last_v"], r["min_v"], r["max_v"]) == (
        5.0, 7.0, 1.0, 9.0,
    )
    assert r["min_ts"].second == 1 * 60 % 60 or r["min_ts"].minute == 1
    assert r["n_samples"] == 4


def test_slo_burn_requires_both_windows(spark, tmp_path):
    # Hour 0: 50% errors inside a clean day -> day burn below threshold,
    # no alert.  Same bad hour inside a bad day -> alert fires.
    def day(day_idx, bad_hours, n=20):
        rows = []
        for h in range(24):
            bad = h in bad_hours
            for i in range(n):
                rows.append(
                    (
                        1,
                        day_idx * 86400 + h * 3600 + i,
                        "error" if (bad and i % 2 == 0) else "view",
                        0.0,
                    )
                )
        return rows

    # day 0: one bad hour only; day 1: twelve bad hours
    rows = day(0, {0}) + day(1, set(range(12)))
    _events(spark, rows).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    out = mining.q_slo_burn_rate(spark, str(tmp_path)).collect()
    days = {r["w_start"].day for r in out}
    assert days == {2}  # only hours of day 1 (Jan 2) page
    assert len(out) == 12
    for r in out:
        assert r["burn_1h"] == 2.5  # 50% errors / 20% budget
        assert r["burn_1d"] == 1.25


def test_importance_sample_weights_and_determinism(spark):
    from prometheus_anomaly_detection_lstm_spark.operators.corpus import (
        q_importance_sample,
    )

    a = q_importance_sample(spark, SF_SMALL).collect()
    b = q_importance_sample(spark, SF_SMALL).collect()
    assert {r["doc_id"] for r in a} == {r["doc_id"] for r in b}
    for r in a:
        assert 0 < r["keep_weight"] <= 1.0
        if r["n_chars"] >= 400:
            assert r["keep_weight"] == 1.0  # long docs always kept


def test_periodogram_finds_planted_period(spark, tmp_path):
    import math

    # 256 samples of sin(2*pi*t/16) + weak sin(2*pi*t/64): the top peak
    # must be period 16, the runner-up 64.
    rows = [
        (
            1,
            s,
            "m",
            math.sin(2 * math.pi * s / 16)
            + 0.3 * math.sin(2 * math.pi * s / 64),
        )
        for s in range(256)
    ]
    _events(spark, rows).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    out = sorted(
        mining.q_metric_periodogram(spark, str(tmp_path)).collect(),
        key=lambda r: r["rank"],
    )
    assert out[0]["period_samples"] == 16.0
    assert out[1]["period_samples"] == 64.0
    assert out[0]["power_share"] > 0.8
    # power shares are a distribution over the spectrum
    assert sum(r["power_share"] for r in out) <= 1.0


def test_periodogram_constant_series_yields_no_rows(spark, tmp_path):
    rows = [(1, s, "m", 4.25) for s in range(64)]
    _events(spark, rows).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    assert mining.q_metric_periodogram(spark, str(tmp_path)).count() == 0


def test_periodogram_short_series_yields_no_rows(spark, tmp_path):
    rows = [(1, s, "m", float(s)) for s in range(4)]
    _events(spark, rows).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    assert mining.q_metric_periodogram(spark, str(tmp_path)).count() == 0


def test_ensemble_votes_are_union_of_branch_flags(spark):
    from prometheus_anomaly_detection_lstm_spark.operators.promql import (
        seasonal_anomaly,
    )

    s = mining._series(spark, SF_SMALL)
    mad = {(r["metric"], r["seq"]) for r in mining.mad_outliers(s).collect()}
    chg = {(r["metric"], r["seq"]) for r in mining.change_points(s).collect()}
    sea = {(r["metric"], r["seq"]) for r in seasonal_anomaly(s).collect()}
    out = {
        (r["metric"], r["seq"]): (r["n_votes"], r["confirmed"])
        for r in mining.anomaly_ensemble(s).collect()
    }
    assert set(out) == mad | chg | sea
    for key, (votes, confirmed) in out.items():
        expect = sum(key in branch for branch in (mad, chg, sea))
        assert votes == expect
        assert confirmed == int(votes >= mining.ENSEMBLE_CONFIRM)
    # the ensemble is not vacuous at the test scale: some sample is
    # flagged by at least one branch
    assert out


def test_psi_detects_planted_drift_and_stays_low_without(spark, tmp_path):
    # stable: same alternating values in both time halves -> tiny PSI;
    # drifted: second half shifted by +100 -> PSI far above the 0.2
    # "significant drift" rule of thumb.
    rows = [(1, s, "stable", float(s % 10)) for s in range(200)] + [
        (1, s, "drifted", float(s % 10) + (100.0 if s >= 100 else 0.0))
        for s in range(200)
    ]
    _events(spark, rows).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    out = {
        r["metric"]: r["psi"]
        for r in mining.q_metric_distribution_drift(
            spark, str(tmp_path)
        ).collect()
    }
    assert out["stable"] < 0.05
    assert out["drifted"] > 1.0


def test_incremental_q1_merge_equals_full_recompute(spark):
    """The MV-refresh theorem: merged partials == full-scan aggregate
    (numeric tolerance — the merge changes float association by one
    step, which is exactly why its ORACLE mirrors the split)."""
    from prometheus_anomaly_detection_lstm_spark.plans import relational as R

    inc = {
        (r["l_returnflag"], r["l_linestatus"]): r
        for r in R.q_tpch_q1_incremental(spark, SF_SMALL).collect()
    }
    full = {
        (r["l_returnflag"], r["l_linestatus"]): r
        for r in R.q_tpch_q1(spark, SF_SMALL).collect()
    }
    assert set(inc) == set(full) and inc
    for key, a in inc.items():
        b = full[key]
        assert a["count_order"] == b["count_order"]
        for c in ("sum_qty", "sum_base_price", "sum_disc_price",
                  "sum_charge", "avg_qty", "avg_price", "avg_disc"):
            assert abs(a[c] - b[c]) <= max(1e-5, 1e-9 * abs(b[c])), (
                key, c, a[c], b[c],
            )


def test_backtest_perfect_on_linear_series(spark, tmp_path):
    # y = 3t + 7 is exactly recoverable by the linear forecaster: MAE
    # and RMSE collapse to ~0; a noisy series scores strictly worse.
    rows = [(1, s, "line", 3.0 * s + 7.0) for s in range(64)] + [
        (1, s, "jumpy", float((s * 37) % 11)) for s in range(64)
    ]
    _events(spark, rows).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    out = {
        r["metric"]: r
        for r in mining.q_metric_forecast_backtest(
            spark, str(tmp_path)
        ).collect()
    }
    assert out["line"]["mae"] < 1e-6 and out["line"]["rmse"] < 1e-6
    assert out["jumpy"]["mae"] > 1.0
    assert out["line"]["n_forecasts"] == 64 - mining.BACKTEST_K


def test_curriculum_stages_partition_the_corpus(spark):
    out = mining.q_corpus_quality_curriculum(spark, SF_SMALL).collect()
    stages = sorted(r["stage"] for r in out)
    assert stages == list(range(len(stages)))
    total = sum(r["n_docs"] for r in out)
    import duckdb

    n_docs = duckdb.sql(
        f"SELECT count(*) FROM '{SF_SMALL}/documents.parquet'"
    ).fetchone()[0]
    assert total == n_docs
    # stage boundaries are ordered: max_chars of stage i < min_chars of
    # stage i+1 is not guaranteed at ties, but avg must be monotone.
    avgs = [r["avg_chars"] for r in sorted(out, key=lambda r: r["stage"])]
    assert avgs == sorted(avgs)


def test_rfm_scores_partition_and_invert_recency(spark):
    from prometheus_anomaly_detection_lstm_spark.plans import relational as R

    rows = R.q_customer_rfm(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert 0 <= r["r_score"] <= 3
        assert r["segment"] == (
            f"{r['r_score']}{r['f_score']}{r['m_score']}"
        )
    # recency inversion: the most recent buyer never scores r=0, the
    # stalest never scores r=3
    by_recency = sorted(rows, key=lambda r: r["recency_days"])
    assert by_recency[0]["r_score"] >= by_recency[-1]["r_score"]


def test_association_rules_lift_symmetry_and_bounds(spark):
    from prometheus_anomaly_detection_lstm_spark.plans import relational as R

    rows = R.q_events_association_rules(spark, SF_SMALL).collect()
    assert rows
    lifts = {(r["antecedent"], r["consequent"]): r["lift"] for r in rows}
    for (a, b), lv in lifts.items():
        assert lifts[(b, a)] == lv  # lift is symmetric
    for r in rows:
        assert 0 < r["support"] <= 1
        assert 0 < r["confidence"] <= 1


def test_ab_test_detects_planted_effect_and_stays_quiet_without(
    spark, tmp_path
):
    # no effect: identical spend per user in both variants -> t == 0;
    # planted effect: variant 1 spends 2x -> |t| blows past critical.
    def events(effect):
        rows = []
        for u in range(40):
            mult = 2.0 if (effect and u % 2 == 1) else 1.0
            for k in range(3):
                rows.append((u, u * 100 + k, "purchase", mult * (10 + u % 5)))
        return rows

    _events(spark, events(False)).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    (quiet,) = mining.q_events_ab_test(spark, str(tmp_path)).collect()
    assert quiet["significant"] == 0 and abs(quiet["t_stat"]) < 1.0

    _events(spark, events(True)).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    (hot,) = mining.q_events_ab_test(spark, str(tmp_path)).collect()
    assert hot["significant"] == 1
    assert hot["mean_b"] > hot["mean_a"]


def test_gini_zero_for_uniform_high_for_concentrated(spark, tmp_path):
    import pandas as pd

    docs = pd.DataFrame(
        [
            {"doc_id": i, "text": "x", "lang": "uni", "source": "s",
             "n_chars": 100}
            for i in range(50)
        ]
        + [
            {"doc_id": 100 + i, "text": "x", "lang": "conc", "source": "s",
             "n_chars": 1 if i else 100000}
            for i in range(50)
        ]
    )
    spark.createDataFrame(docs).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    out = {
        r["lang"]: r["gini"]
        for r in mining.q_corpus_length_gini(spark, str(tmp_path)).collect()
    }
    assert out["uni"] == 0.0
    assert out["conc"] > 0.9


def test_ccf_recovers_planted_lead_lag(spark, tmp_path):
    import math

    # metric "b" is metric "a" delayed by one 15-minute bucket: the
    # cross-correlation must peak (≈1) at lag +1 for (a leads b).
    rows = []
    for t in range(96):
        v = math.sin(2 * math.pi * t / 24) + t * 0.01
        rows.append((1, t * 900 + 10, "a", v))
        rows.append((1, (t + 1) * 900 + 20, "b", v))
    _events(spark, rows).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    out = {
        (r["m_lead"], r["m_follow"], r["lag"]): r["ccf"]
        for r in mining.q_metric_cross_correlation(
            spark, str(tmp_path)
        ).collect()
    }
    peak_lag = max(
        (lag for (a, b, lag) in out if (a, b) == ("a", "b")),
        key=lambda lag: out[("a", "b", lag)],
    )
    assert peak_lag == 1
    assert out[("a", "b", 1)] > 0.999
    assert out[("a", "b", 0)] < out[("a", "b", 1)]


def test_ltv_curve_monotone_and_totals(spark):
    import duckdb

    rows = mining.q_cohort_ltv_curve(spark, SF_SMALL).collect()
    assert rows
    by_cohort = {}
    for r in sorted(rows, key=lambda r: (r["cohort_week"], r["age_weeks"])):
        prev = by_cohort.get(r["cohort_week"], 0.0)
        assert r["cum_revenue"] >= prev  # cumulative is monotone
        assert r["cum_revenue"] >= r["revenue"]
        by_cohort[r["cohort_week"]] = r["cum_revenue"]
    total = duckdb.sql(
        f"SELECT round(sum(value), 6) FROM '{SF_SMALL}/events.parquet'"
        " WHERE event_type = 'purchase'"
    ).fetchone()[0]
    assert abs(sum(by_cohort.values()) - total) < 1e-4


def test_bot_cadence_flags_metronome_not_poisson(spark, tmp_path):
    import random

    rng = random.Random(7)
    rows = []
    # user 1: metronome (exact 60s gaps); user 2: poisson-ish
    for k in range(40):
        rows.append((1, k * 60, "view", 0.0))
    t = 0.0
    for k in range(40):
        t += rng.expovariate(1 / 60)
        rows.append((2, t, "view", 0.0))
    _events(spark, rows).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    out = {r["user_id"]: r["cadence_cv"] for r in
           mining.q_events_bot_cadence(spark, str(tmp_path)).collect()}
    assert 1 in out and out[1] == 0.0  # perfectly regular
    assert 2 not in out                # human-ish stays unflagged


# ---------------------------------------- ANSI degenerate-input guards

def test_bot_cadence_survives_same_instant_burst(spark):
    """>= 21 events at ONE instant: avg gap 0 would be 0/0 under ANSI;
    the NULL cv must drop the row (DuckDB semantics), not crash."""
    import datetime as dt

    from prometheus_anomaly_detection_lstm_spark.plans.mining import bot_cadence

    rows = [
        (i, dt.datetime(2024, 1, 1, 0, 0, 0), 7, "click", 0.0, "{}")
        for i in range(25)
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string",
    )
    assert bot_cadence(ev).collect() == []  # dropped, not crashed


def test_periodogram_no_inf_rows_on_sparse_spectrum(spark):
    """A two-bin spectrum must yield at most 2 ranks — never an inf
    period from the zeroed DC bin padding out the top-k."""
    import datetime as dt
    import math

    from prometheus_anomaly_detection_lstm_spark.plans.mining import periodogram

    rows = [
        ("m", dt.datetime(2024, 1, 1) + dt.timedelta(minutes=i), i, float(i % 2))
        for i in range(64)
    ]
    s = spark.createDataFrame(
        rows, "metric string, ts timestamp_ntz, seq long, value double"
    )
    out = periodogram(s).collect()
    assert out  # the alternating signal has a real peak
    for r in out:
        assert math.isfinite(r["period_samples"])
        assert r["power_share"] > 0
