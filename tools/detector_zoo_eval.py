"""Detector-zoo scorecard: every anomaly detector on one labeled bench.

Synthesizes hourly series (daily sinusoid + Gaussian noise, seeded) and
plants point anomalies at known positions, then runs the model-free
detector zoo over the SAME frame and scores each against the planted
truth at hour granularity — precision, recall, F1.  The detectors have
deliberately disjoint failure modes, so the scorecard shows what each
buys (and documents CUSUM's persistence: a cumulative statistic stays
elevated for a few hours after a spike, trading precision for
shift-detection power).

    python tools/detector_zoo_eval.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_SERIES = 4
N_DAYS = 14
N_ANOMALIES = 5  # per series
SPIKE = 8.0      # in noise-sigma units (sigma = 1, amplitude 10 cycle)
SEED = 42


def main() -> None:
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from prometheus_anomaly_detection_lstm_spark.operators.promql import (
        seasonal_anomaly,
    )
    from prometheus_anomaly_detection_lstm_spark.plans import (
        mining,
        robust,
        wave8,
    )
    from prometheus_anomaly_detection_lstm_spark.session import get_spark

    rng = np.random.default_rng(SEED)
    rows, truth = [], set()
    for m in range(N_SERIES):
        metric = f"m{m}"
        n = N_DAYS * 24
        hours = np.arange(n)
        base = 100.0 + 10.0 * np.sin(hours % 24 / 24 * 2 * np.pi)
        noise = rng.normal(0, 1.0, n)
        vals = base + noise
        # plant spikes away from the first two days (detector warm-up)
        spots = rng.choice(np.arange(48, n), size=N_ANOMALIES, replace=False)
        vals[spots] += SPIKE * np.where(rng.random(N_ANOMALIES) < 0.5, -1, 1)
        for i in range(n):
            ts = pd.Timestamp("2024-03-01") + pd.Timedelta(hours=int(i))
            rows.append((metric, ts, i, float(vals[i])))
            if i in spots:
                truth.add((metric, ts))

    spark = get_spark("detector-zoo")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    s = spark.createDataFrame(
        pd.DataFrame(rows, columns=["metric", "ts", "seq", "value"])
    )

    def flags_cusum():
        return {
            (r.metric, r.ts) for r in robust.cusum_anomalies(s).collect()
        }

    def flags_mad():
        return {(r.metric, r.ts) for r in mining.mad_outliers(s).collect()}

    def flags_ensemble():
        return {
            (r.metric, r.ts)
            for r in mining.anomaly_ensemble(s).collect()
            if r.confirmed
        }

    def flags_sr():
        return {
            (r.metric, r.day + pd.Timedelta(hours=r.hr))
            for r in wave8.spectral_residual_anomalies(s).collect()
        }

    def flags_hw():
        return {
            (r.metric, r.ts_hour)
            for r in wave8.holt_winters_anomalies(s).collect()
        }

    def flags_seasonal():
        return {(r.metric, r.ts) for r in seasonal_anomaly(s).collect()}

    def flags_seasonal_mad():
        return {
            (r.metric, r.ts)
            for r in wave8.seasonal_mad_anomalies(s).collect()
        }

    detectors = {
        "seasonal_z": flags_seasonal,
        "seasonal_mad": flags_seasonal_mad,
        "cusum": flags_cusum,
        "mad_robust_z": flags_mad,
        "ensemble_2of3": flags_ensemble,
        "spectral_residual": flags_sr,
        "holt_winters": flags_hw,
    }
    report = {}
    for name, get in detectors.items():
        got = get()
        tp = len(got & truth)
        prec = tp / len(got) if got else 0.0
        rec = tp / len(truth)
        f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
        report[name] = {
            "flagged": len(got),
            "precision": round(prec, 3),
            "recall": round(rec, 3),
            "f1": round(f1, 3),
        }
        print(name, report[name], flush=True)
    print(json.dumps({"truth": len(truth), "detectors": report}))

    # ---- scenario 2: sustained +3-sigma level shift for 24 h ----
    # the complementary failure mode: CUSUM integrates small shifts,
    # point-spike detectors see nothing hour-by-hour
    rows2, shift_start = [], {}
    for m in range(N_SERIES):
        metric = f"s{m}"
        n = N_DAYS * 24
        hours = np.arange(n)
        base = 100.0 + 10.0 * np.sin(hours % 24 / 24 * 2 * np.pi)
        vals = base + rng.normal(0, 1.0, n)
        start = int(rng.integers(72, n - 48))
        vals[start : start + 24] += 3.0
        shift_start[metric] = pd.Timestamp("2024-03-01") + pd.Timedelta(
            hours=start
        )
        for i in range(n):
            ts = pd.Timestamp("2024-03-01") + pd.Timedelta(hours=int(i))
            rows2.append((metric, ts, i, float(vals[i])))
    s2 = spark.createDataFrame(
        pd.DataFrame(rows2, columns=["metric", "ts", "seq", "value"])
    )

    def in_shift(metric, ts):
        st = shift_start[metric]
        return st <= ts < st + pd.Timedelta(hours=24)

    shift_flags = {
        "seasonal_z": {
            (r.metric, r.ts) for r in seasonal_anomaly(s2).collect()
        },
        "seasonal_mad": {
            (r.metric, r.ts)
            for r in wave8.seasonal_mad_anomalies(s2).collect()
        },
        "cusum": {
            (r.metric, r.ts) for r in robust.cusum_anomalies(s2).collect()
        },
        "mad_robust_z": {
            (r.metric, r.ts) for r in mining.mad_outliers(s2).collect()
        },
        "spectral_residual": {
            (r.metric, r.day + pd.Timedelta(hours=r.hr))
            for r in wave8.spectral_residual_anomalies(s2).collect()
        },
        "holt_winters": {
            (r.metric, r.ts_hour)
            for r in wave8.holt_winters_anomalies(s2).collect()
        },
    }
    report2 = {}
    for name, got in shift_flags.items():
        detected = {
            m for m in shift_start if any(
                k[0] == m and in_shift(*k) for k in got
            )
        }
        false_alarms = sum(1 for k in got if not in_shift(*k))
        report2[name] = {
            "series_detected": f"{len(detected)}/{N_SERIES}",
            "false_alarm_hours": false_alarms,
        }
        print("shift:", name, report2[name], flush=True)

    # GLR change-point LOCALIZATION on the same shifted series: the
    # zoo's detectors say "something is off"; GLR says WHERE.  Score =
    # |argmax boundary - true shift start| in hours, per series.
    from prometheus_anomaly_detection_lstm_spark.plans.wave9 import GLR_HALF
    from pyspark.sql import Window as W
    from pyspark.sql import functions as FF

    hourly2 = s2.groupBy(
        "metric", F.date_trunc("hour", "ts").alias("hour")
    ).agg(F.avg("value").alias("y"))
    sig2 = hourly2.groupBy("metric").agg(FF.var_pop("y").alias("var_y"))
    wpre = W.partitionBy("metric").orderBy("hour").rowsBetween(
        -GLR_HALF, -1
    )
    wpost = W.partitionBy("metric").orderBy("hour").rowsBetween(
        0, GLR_HALF - 1
    )
    fr = (
        hourly2.withColumn("n1", FF.count("y").over(wpre))
        .withColumn("m1", FF.avg("y").over(wpre))
        .withColumn("n2", FF.count("y").over(wpost))
        .withColumn("m2", FF.avg("y").over(wpost))
        .filter((FF.col("n1") == GLR_HALF) & (FF.col("n2") == GLR_HALF))
        .join(FF.broadcast(sig2), "metric")
        .withColumn(
            "stat",
            FF.col("n1") * FF.col("n2") / (FF.col("n1") + FF.col("n2"))
            * (FF.col("m2") - FF.col("m1")) ** 2 / FF.col("var_y"),
        )
    )
    wtop = W.partitionBy("metric").orderBy(
        FF.col("stat").desc(), FF.col("hour").asc()
    )
    glr_loc = {
        r.metric: r.hour
        for r in fr.withColumn("rk", FF.row_number().over(wtop))
        .filter(FF.col("rk") == 1)
        .collect()
    }
    # a 24 h level shift has TWO equally strong step edges (up at
    # start, down at start+24 h); localizing either is correct —
    # score against the nearest true edge
    def edge_err(m):
        st = shift_start[m]
        edges = (st, st + pd.Timedelta(hours=24))
        return min(
            abs(int((glr_loc[m] - e).total_seconds() // 3600))
            for e in edges
        )

    loc_err = {m: edge_err(m) for m in shift_start if m in glr_loc}
    report2["glr_localization"] = {
        "localized_series": f"{len(loc_err)}/{N_SERIES}",
        "abs_error_hours_to_nearest_edge": loc_err,
        "max_abs_error_hours": max(loc_err.values()) if loc_err else None,
    }
    print("shift: glr_localization", report2["glr_localization"], flush=True)
    print(json.dumps({"shift_scenario": report2}, default=str))

    # ---- scenario 3: heavy slot contamination ----
    # 40% of ONE hour-of-day slot's history carries +8-sigma spikes (a
    # recurring 6 am incident).  A mean/std seasonal profile absorbs
    # the contamination (inflated mu and sigma -> small z); the
    # median/MAD profile stays anchored on the clean 60%.
    rows3, truth3 = [], set()
    n = N_DAYS * 24
    hours = np.arange(n)
    base = 100.0 + 10.0 * np.sin(hours % 24 / 24 * 2 * np.pi)
    vals = base + rng.normal(0, 1.0, n)
    slot_idx = np.nonzero(hours % 24 == 6)[0]
    bad = rng.choice(slot_idx, size=int(0.4 * len(slot_idx)), replace=False)
    vals[bad] += SPIKE
    for i in range(n):
        ts = pd.Timestamp("2024-03-01") + pd.Timedelta(hours=int(i))
        rows3.append(("c0", ts, i, float(vals[i])))
        if i in bad:
            truth3.add(("c0", ts))
    s3 = spark.createDataFrame(
        pd.DataFrame(rows3, columns=["metric", "ts", "seq", "value"])
    )
    contam = {
        "seasonal_z": {
            (r.metric, r.ts) for r in seasonal_anomaly(s3).collect()
        },
        "seasonal_mad": {
            (r.metric, r.ts)
            for r in wave8.seasonal_mad_anomalies(s3).collect()
        },
    }
    report3 = {}
    for name, got in contam.items():
        tp = len(got & truth3)
        report3[name] = {
            "flagged": len(got),
            "recall": round(tp / len(truth3), 3),
            "precision": round(tp / len(got), 3) if got else 0.0,
        }
        print("contam:", name, report3[name], flush=True)
    print(json.dumps({"contamination_scenario": report3}))

    # ---- scenario 4: slow ramp (trend drift) ----
    # The remaining classic failure axis: +0.025 sigma/hour linear
    # drift (reaches +3 sigma after 5 days, never a per-hour jump).
    # Point detectors see each hour as near-normal; CUSUM integrates
    # it; the TREND instruments (Theil-Sen slope, Dickey-Fuller
    # stationarity) are built for exactly this and must earn their
    # registry slots here.  4 ramp series (d*) + 4 stationary
    # controls (k*) so slope/stationarity verdicts are calibrated
    # against a null, not just the positive.
    from prometheus_anomaly_detection_lstm_spark.plans.robust import (
        theil_sen_trend,
    )

    DRIFT = 0.025  # sigma/hour
    rows4, ramp_start = [], {}
    n = N_DAYS * 24
    hours = np.arange(n)
    base = 100.0 + 10.0 * np.sin(hours % 24 / 24 * 2 * np.pi)
    for m in range(N_SERIES):
        for kind in ("d", "k"):
            metric = f"{kind}{m}"
            vals = base + rng.normal(0, 1.0, n)
            if kind == "d":
                start = int(rng.integers(72, n - 144))
                ramp = np.maximum(hours - start, 0) * DRIFT
                vals = vals + ramp
                ramp_start[metric] = pd.Timestamp(
                    "2024-03-01"
                ) + pd.Timedelta(hours=start)
            for i in range(n):
                ts = pd.Timestamp("2024-03-01") + pd.Timedelta(
                    hours=int(i)
                )
                rows4.append((metric, ts, i, float(vals[i])))
    s4 = spark.createDataFrame(
        pd.DataFrame(rows4, columns=["metric", "ts", "seq", "value"])
    )

    def in_ramp_alarm_window(metric, ts):
        # credit flags once the drift has accumulated >= 2 sigma
        st = ramp_start.get(metric)
        return st is not None and ts >= st + pd.Timedelta(
            hours=int(2.0 / DRIFT)
        )

    ramp_flags = {
        "seasonal_z": {
            (r.metric, r.ts) for r in seasonal_anomaly(s4).collect()
        },
        "seasonal_mad": {
            (r.metric, r.ts)
            for r in wave8.seasonal_mad_anomalies(s4).collect()
        },
        "cusum": {
            (r.metric, r.ts) for r in robust.cusum_anomalies(s4).collect()
        },
        "mad_robust_z": {
            (r.metric, r.ts) for r in mining.mad_outliers(s4).collect()
        },
        "spectral_residual": {
            (r.metric, r.day + pd.Timedelta(hours=r.hr))
            for r in wave8.spectral_residual_anomalies(s4).collect()
        },
        "holt_winters": {
            (r.metric, r.ts_hour)
            for r in wave8.holt_winters_anomalies(s4).collect()
        },
    }
    report4 = {}
    for name, got in ramp_flags.items():
        detected = {
            m for m in ramp_start if any(
                k[0] == m and in_ramp_alarm_window(*k) for k in got
            )
        }
        # false alarms: any flag on a CONTROL series (k*)
        false_alarms = sum(1 for k in got if k[0].startswith("k"))
        report4[name] = {
            "series_detected": f"{len(detected)}/{N_SERIES}",
            "control_false_alarm_hours": false_alarms,
        }
        print("ramp:", name, report4[name], flush=True)

    # trend instruments: verdict per series, thresholded against the
    # truth (true slope = DRIFT on ramps, 0 on controls).
    # METHOD NOTE (measured): applied to the raw hourly series both
    # instruments are season-dominated — the +-2.6/h diurnal slope
    # swamps a 0.025/h drift (Theil-Sen medians land at ~0.00 for both
    # arms) and the daily cycle pins DF tau at ~-2.9..-3.0 for both.
    # The correct protocol is the same one metric_holt_winters uses:
    # roll up to the SEASONAL PERIOD first (daily means), which
    # removes the cycle exactly, then test the trend.
    daily = (
        pd.DataFrame(rows4, columns=["metric", "ts", "seq", "value"])
        .assign(day=lambda d: d.ts.dt.floor("D"))
        .groupby(["metric", "day"], as_index=False)["value"]
        .mean()
        .rename(columns={"day": "ts"})
    )
    daily["seq"] = daily.groupby("metric").cumcount()
    s4d = spark.createDataFrame(daily[["metric", "ts", "seq", "value"]])
    # daily spacing = 24 h, so theil_sen's per-hour slope over daily
    # points still reads in value-units/hour (the drift rate itself)
    slopes = {
        r.metric: r.theil_sen_slope
        for r in theil_sen_trend(s4d).collect()
    }
    # the median pairwise slope is DILUTED by the flat pre-ramp
    # segment (ramps start 3-8 days into the 14-day window), so the
    # point estimate reads ~0.3-0.7x the true drift rate; controls
    # measure |slope| <= 0.0006.  0.2x the target drift separates the
    # arms by >10x margin while staying tied to the effect size.
    ts_ramp_hits = sum(
        1 for m in ramp_start if slopes.get(m, 0.0) >= DRIFT * 0.2
    )
    ts_control_fas = sum(
        1
        for m, v in slopes.items()
        if m.startswith("k") and abs(v) >= DRIFT * 0.2
    )
    report4["theil_sen_slope"] = {
        "series_detected": f"{ts_ramp_hits}/{N_SERIES}",
        "control_false_alarm_hours": ts_control_fas,
        "slopes": {m: round(v, 4) for m, v in sorted(slopes.items())},
    }
    print("ramp: theil_sen_slope", report4["theil_sen_slope"], flush=True)

    df_rows = {
        r.metric: (r.df_tau, r.stationary_5pct)
        for r in wave8.df_stationarity(s4d).collect()
    }
    # a ramping series fails the stationarity test (unit-root-like
    # under a constant-only DF regression); a clean seasonal series
    # passes — "detected" = flagged NON-stationary
    df_ramp_hits = sum(
        1 for m in ramp_start if df_rows.get(m, (0, 1))[1] == 0
    )
    df_control_fas = sum(
        1
        for m, (_, st) in df_rows.items()
        if m.startswith("k") and st == 0
    )
    report4["df_nonstationarity"] = {
        "series_detected": f"{df_ramp_hits}/{N_SERIES}",
        "control_false_alarm_hours": df_control_fas,
        "tau": {m: round(v[0], 2) for m, v in sorted(df_rows.items())},
    }
    print(
        "ramp: df_nonstationarity", report4["df_nonstationarity"],
        flush=True,
    )
    print(json.dumps({"ramp_scenario": report4}))

    # ---- scenario 5: SPOT/EVT threshold vs the static percentile ----
    # Round-7 verdict task 5.  Every detector above consumes a
    # hand-set level (A11's percentile or config.yaml's 0.0025); SPOT
    # fits the alarm level from the score tail itself.  Both rules
    # threshold the SAME seasonal |z| score stream (slot-profile
    # residuals — thresholding raw values would hide trough-aligned
    # spikes from both rules equally), and SPOT runs the paper's
    # sequential protocol via streaming/spot.SpotCalibrator: warm up
    # on the first 48 h (the zoo plants spikes after day 2 for exactly
    # this reason), then walk forward — alarmed scores are never fed
    # back into calibration, so planted anomalies cannot raise the bar
    # (a BLIND whole-history GPD fit would model the planted spikes as
    # the tail and extrapolate past them).  Expectations:
    # Both rules score the same eval window (hour >= SPOT_WARM); the
    # static level is the p99 of the FULL score history — exactly how
    # a percentile threshold is set in practice.  Sub-scenarios:
    #   dense spikes (5/series, ~1.5% rate) — static p99's fixed top-1%
    #     happens to MATCH the planted rate, its best case;
    #   rare spike (1/series, ~0.3% rate) — the common production case:
    #     p99 over-alarms ~3:1 by construction; SPOT's risk-q level
    #     does not chase the rate;
    #   clean (no anomalies) — p99 still alarms 1% of the time; SPOT
    #     alarms at ~q.
    from prometheus_anomaly_detection_lstm_spark.streaming.spot import (
        SpotCalibrator,
    )

    SPOT_WARM = 96  # 4-day calibration; zoo plants spikes after day 2

    def seasonal_scores(frame: pd.DataFrame) -> pd.DataFrame:
        """per-(metric, hour-of-day) |z| over the slot profile."""
        f = frame.copy()
        f["slot"] = f["ts"].dt.hour
        prof = f.groupby(["metric", "slot"])["value"].agg(
            ["mean", "std"]
        )
        f = f.join(prof, on=["metric", "slot"])
        f["score"] = (f["value"] - f["mean"]).abs() / f["std"]
        return f

    def spot_vs_static(frame: pd.DataFrame, truth_set: set) -> dict:
        scored = seasonal_scores(frame)
        truth_eval = {
            (m, ts)
            for (m, ts) in truth_set
            if (scored[(scored.metric == m) & (scored.ts == ts)].seq >= SPOT_WARM).all()
        }
        spot_got = set()
        for metric, g in scored.sort_values("seq").groupby("metric"):
            cal = SpotCalibrator(min_history=SPOT_WARM)
            for r in g.itertuples():
                thr = cal.threshold
                if r.seq >= SPOT_WARM and thr is not None and r.score > thr:
                    spot_got.add((metric, r.ts))  # alarm: not observed
                else:
                    cal.observe(r.score)
        p99 = scored.groupby("metric")["score"].quantile(0.99)
        static_got = {
            (r.metric, r.ts)
            for r in scored.itertuples()
            if r.seq >= SPOT_WARM and r.score > p99[r.metric]
        }
        out = {}
        for rule, got in (("spot_evt", spot_got), ("static_p99", static_got)):
            tp = len(got & truth_eval)
            prec = tp / len(got) if got else 1.0
            rec = tp / len(truth_eval) if truth_eval else 1.0
            f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
            out[rule] = {
                "flagged": len(got),
                "false_alarms": len(got - truth_eval),
                "precision": round(prec, 3),
                "recall": round(rec, 3),
                "f1": round(f1, 3),
            }
            print("spot_vs_static:", rule, out[rule], flush=True)
        return out

    spike_frame = pd.DataFrame(
        rows, columns=["metric", "ts", "seq", "value"]
    )
    report5 = {"dense_spikes": spot_vs_static(spike_frame, truth)}

    rng5 = np.random.default_rng(SEED + 7)
    rows5, truth5 = [], set()
    for m in range(N_SERIES):
        n = N_DAYS * 24
        hours = np.arange(n)
        base = 100.0 + 10.0 * np.sin(hours % 24 / 24 * 2 * np.pi)
        vals = base + rng5.normal(0, 1.0, n)
        spots = rng5.choice(np.arange(SPOT_WARM, n), size=1, replace=False)
        vals[spots] += SPIKE
        for i in range(n):
            ts = pd.Timestamp("2024-03-01") + pd.Timedelta(hours=int(i))
            rows5.append((f"r{m}", ts, i, float(vals[i])))
            if i in spots:
                truth5.add((f"r{m}", ts))
    rare_frame = pd.DataFrame(
        rows5, columns=["metric", "ts", "seq", "value"]
    )
    report5["rare_spike"] = spot_vs_static(rare_frame, truth5)

    rng6 = np.random.default_rng(SEED + 5)
    rows6 = []
    for m in range(N_SERIES):
        n = N_DAYS * 24
        hours = np.arange(n)
        base = 100.0 + 10.0 * np.sin(hours % 24 / 24 * 2 * np.pi)
        vals = base + rng6.normal(0, 1.0, n)
        for i in range(n):
            ts = pd.Timestamp("2024-03-01") + pd.Timedelta(hours=int(i))
            rows6.append((f"n{m}", ts, i, float(vals[i])))
    clean_frame = pd.DataFrame(
        rows6, columns=["metric", "ts", "seq", "value"]
    )
    report5["clean"] = spot_vs_static(clean_frame, set())

    # drifting baseline: +6-sigma linear ramp over the fortnight with
    # one late +8-sigma spike, thresholds applied to the RAW scores
    # (the slot profile can't absorb a trend).  Plain SPOT calibrates
    # on the early low regime and then drowns (its own alarms freeze
    # recalibration); DSPOT (streaming/spot.DriftSpotCalibrator) fits
    # residuals against a 24 h moving average and stays calibrated;
    # static p99 of the full history splits the ramp at its own 1%.
    from prometheus_anomaly_detection_lstm_spark.streaming.spot import (
        DriftSpotCalibrator,
    )

    rng7 = np.random.default_rng(SEED + 9)
    n = N_DAYS * 24
    drift_report = {}
    for rule_name, make in (
        ("spot_evt", lambda: SpotCalibrator(min_history=SPOT_WARM)),
        ("dspot_drift", lambda: DriftSpotCalibrator(min_history=SPOT_WARM, depth=24)),
    ):
        tp = fa = 0
        rng = np.random.default_rng(SEED + 9)
        for m in range(N_SERIES):
            scores = np.linspace(0.0, 6.0, n) + rng.normal(0, 1.0, n)
            spike_at = int(rng.integers(SPOT_WARM + 48, n))
            scores[spike_at] += 8.0
            cal = make()
            for i, s0 in enumerate(scores):
                thr = cal.threshold
                if i >= SPOT_WARM and thr is not None and s0 > thr:
                    if i == spike_at:
                        tp += 1
                    else:
                        fa += 1
                else:
                    cal.observe(s0)
        drift_report[rule_name] = {
            "spikes_caught": f"{tp}/{N_SERIES}",
            "false_alarms": fa,
        }
        print("drift:", rule_name, drift_report[rule_name], flush=True)
    rng = np.random.default_rng(SEED + 9)
    tp = fa = 0
    for m in range(N_SERIES):
        scores = np.linspace(0.0, 6.0, n) + rng.normal(0, 1.0, n)
        spike_at = int(rng.integers(SPOT_WARM + 48, n))
        scores[spike_at] += 8.0
        p99 = np.quantile(scores, 0.99)
        got = {i for i in range(SPOT_WARM, n) if scores[i] > p99}
        tp += int(spike_at in got)
        fa += len(got - {spike_at})
    drift_report["static_p99"] = {
        "spikes_caught": f"{tp}/{N_SERIES}", "false_alarms": fa,
    }
    print("drift: static_p99", drift_report["static_p99"], flush=True)
    report5["drifting_baseline"] = drift_report
    print(json.dumps({"spot_vs_static": report5}))


if __name__ == "__main__":
    main()
