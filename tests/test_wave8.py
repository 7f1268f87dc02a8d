"""Semantic pins for plans/wave8.py beyond the DuckDB oracle parity:

- spectral residual equals the from-the-definition numpy replica row
  for row, detects a planted spike, and is partitioning-invariant;
- SAX words match a hand-computed closed form on constructed series
  and are hour-ordered with length == n_segments;
- PMI matches a hand-computed tiny corpus (ln of exact ratios);
- hard negatives / positives match a brute-force numpy replica,
  and margin = hard_pos_cos - hard_neg_cos;
- the skew profile matches a pandas value_counts replica.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from prometheus_anomaly_detection_lstm_spark.io_tables import (
    events_series,
    load_table,
)
from prometheus_anomaly_detection_lstm_spark.plans import wave8

from .conftest import SF_SMALL


# ------------------------------------------------- spectral residual

def test_sr_matches_numpy_definition(spark):
    got = (
        wave8.q_metric_spectral_residual(spark, SF_SMALL)
        .toPandas()
        .sort_values(["metric", "day", "hr"])
        .reset_index(drop=True)
    )
    raw = events_series(spark, SF_SMALL).toPandas()
    raw["day"] = raw["ts"].dt.floor("D")
    raw["hr"] = raw["ts"].dt.hour
    hourly = (
        raw.groupby(["metric", "day", "hr"], as_index=False)["value"]
        .mean()
        .rename(columns={"value": "hourly_value"})
    )
    want = []
    for (metric, day), g in hourly.groupby(["metric", "day"]):
        g = g.sort_values("hr").reset_index(drop=True)
        sal = wave8.sr_saliency(g["hourly_value"].to_numpy())
        med = np.median(sal)
        rel = (sal - med) / (med + wave8.SR_EPS)
        for i in np.nonzero(rel > wave8.SR_THRESHOLD)[0]:
            want.append(
                (metric, day, int(g["hr"][i]), round(float(rel[i]), 6))
            )
    got_set = {
        (r.metric, r.day, r.hr, round(r.saliency_score, 6))
        for r in got.itertuples()
    }
    assert got_set == set(want)


def test_sr_detects_planted_spike_and_partition_invariant(spark):
    # flat day with one huge spike at hour 12: SR must flag exactly it
    rows = [
        ("m", f"2024-03-01 {h:02d}:00:00", h, 100.0 + (900.0 if h == 12 else 0.0))
        for h in range(24)
    ]
    s = spark.createDataFrame(
        rows, "metric string, ts string, seq long, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = wave8.spectral_residual_anomalies(s).toPandas()
    assert list(out["hr"]) == [12]
    out7 = wave8.spectral_residual_anomalies(s.repartition(7)).toPandas()
    pd.testing.assert_frame_equal(
        out.sort_values("hr").reset_index(drop=True),
        out7.sort_values("hr").reset_index(drop=True),
    )


# --------------------------------------------------------------- SAX

def test_sax_closed_form_word(spark):
    # z = [-1, -1, +1, +1] -> symbols a a d d (quartile breakpoints)
    rows = [
        ("m", f"2024-03-01 {h:02d}:00:00", h, v)
        for h, v in [(0, 0.0), (1, 0.0), (2, 10.0), (3, 10.0)]
    ]
    s = spark.createDataFrame(
        rows, "metric string, ts string, seq long, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = wave8.sax_symbols(s).collect()
    assert len(out) == 1
    assert out[0].word == "aadd"
    assert out[0].n_segments == 4


def test_sax_words_wellformed(spark):
    out = wave8.q_metric_sax_symbols(spark, SF_SMALL).toPandas()
    assert len(out) > 0
    assert (out["word"].str.len() == out["n_segments"]).all()
    assert out["word"].str.fullmatch("[abcd]+").all()


# --------------------------------------------------------------- PMI

def test_pmi_closed_form_tiny_corpus(spark):
    docs = spark.createDataFrame(
        [(0, "a b a b"), (1, "a b c")], "doc_id long, text string"
    )
    out = {
        (r.w1, r.w2): (r.c_xy, r.pmi)
        for r in wave8.pmi_collocations(docs, min_count=1, top_k=10).collect()
    }
    # bigrams: (a,b) x3, (b,a) x1, (b,c) x1 -> N=5
    # margins re-aggregate bigram counts: c_x (over w1): a->3, b->2;
    # c_y (over w2): b->3, a->1, c->1
    assert out[("a", "b")] == (3, round(math.log(3 * 5 / (3 * 3)), 6))
    assert out[("b", "a")] == (1, round(math.log(1 * 5 / (2 * 1)), 6))
    assert out[("b", "c")] == (1, round(math.log(1 * 5 / (2 * 1)), 6))


def test_pmi_topk_order(spark):
    docs = load_table(spark, SF_SMALL, "documents")
    out = wave8.pmi_collocations(docs, min_count=2, top_k=20).toPandas()
    assert len(out) > 0
    assert (out["c_xy"] >= 2).all()
    pmis = out["pmi"].tolist()
    assert pmis == sorted(pmis, reverse=True)


# ------------------------------------------------------ hard negatives

def test_hard_negatives_match_bruteforce(spark):
    got = {
        r.q_id: r
        for r in wave8.q_embedding_hard_negatives(spark, SF_SMALL).collect()
    }
    emb = load_table(spark, SF_SMALL, "embeddings").toPandas()
    vecs = np.stack(emb["embedding"].to_numpy()).astype("float64")
    norms = np.sqrt((vecs * vecs).sum(axis=1))
    labels = emb["label"].to_numpy()
    ids = emb["vec_id"].to_numpy()
    order = np.argsort(ids)
    vecs, norms, labels, ids = (
        vecs[order], norms[order], labels[order], ids[order]
    )
    checked = 0
    for qi in np.nonzero(ids < wave8.HN_ANCHORS)[0]:
        den = norms * norms[qi]
        with np.errstate(divide="ignore", invalid="ignore"):
            cos = vecs @ vecs[qi] / np.where(den == 0, np.nan, den)
        cos[qi] = np.nan
        negm = (labels != labels[qi]) & ~np.isnan(cos)
        posm = (labels == labels[qi]) & ~np.isnan(cos)
        posm[qi] = False
        if not negm.any() or not posm.any():
            assert ids[qi] not in got
            continue
        # ties break on lower id in both directions
        neg_order = np.lexsort((ids[negm], -cos[negm]))
        pos_order = np.lexsort((ids[posm], cos[posm]))
        ni = np.nonzero(negm)[0][neg_order[0]]
        pi = np.nonzero(posm)[0][pos_order[0]]
        r = got[ids[qi]]
        assert (r.hard_neg_id, r.hard_pos_id) == (ids[ni], ids[pi])
        assert r.hard_neg_cos == pytest.approx(round(cos[ni], 6), abs=1e-9)
        assert r.hard_pos_cos == pytest.approx(round(cos[pi], 6), abs=1e-9)
        assert r.margin == pytest.approx(
            round(cos[pi] - cos[ni], 6), abs=1e-6
        )
        checked += 1
    assert checked == len(got) > 0


# --------------------------------------------------------- skew profile

def test_skew_profile_matches_pandas(spark):
    got = {
        (r.rel, r.key): r
        for r in wave8.q_join_key_skew_profile(spark, SF_SMALL).collect()
    }
    assert set(got) == {
        ("events", "user_id"),
        ("lineitem", "l_orderkey"),
        ("orders", "o_custkey"),
    }
    ev = load_table(spark, SF_SMALL, "events").toPandas()
    cnts = ev["user_id"].value_counts()
    r = got[("events", "user_id")]
    assert r.n_rows == len(ev)
    assert r.n_keys == cnts.size
    assert r.max_cnt == cnts.max()
    assert r.top_share == pytest.approx(cnts.max() / len(ev), abs=1e-6)
    assert r.p50_cnt == pytest.approx(np.percentile(cnts, 50), abs=1e-6)


# ------------------------------------------------------ Holt-Winters

def _hw_replica(x, m, a, b, g):
    """Independent textbook additive HW recursion (one-step forecasts)."""
    n = len(x)
    fc = [float("nan")] * n
    if n < 2 * m:
        return fc
    level = sum(x[:m]) / m
    trend = (sum(x[m : 2 * m]) / m - sum(x[:m]) / m) / m
    season = [x[i] - level for i in range(m)]
    for t in range(m, n):
        s = season[t % m]
        fc[t] = level + trend + s
        new_level = a * (x[t] - s) + (1 - a) * (level + trend)
        trend = b * (new_level - level) + (1 - b) * trend
        season[t % m] = g * (x[t] - new_level) + (1 - g) * s
        level = new_level
    return fc


def test_hw_forecast_matches_textbook_recursion():
    rng = np.random.default_rng(7)
    x = (
        10.0
        + np.tile(np.sin(np.arange(24) / 24 * 2 * np.pi), 10)
        + rng.normal(0, 0.1, 240)
    )
    got = wave8.holt_winters_forecast(x)
    want = _hw_replica(
        list(x), wave8.HW_PERIOD, wave8.HW_ALPHA, wave8.HW_BETA, wave8.HW_GAMMA
    )
    assert np.isnan(got[: wave8.HW_PERIOD]).all()  # no pre-init forecast
    np.testing.assert_allclose(
        got[wave8.HW_PERIOD :], want[wave8.HW_PERIOD :], rtol=1e-12
    )


def test_hw_detects_seasonal_break_and_partition_invariant(spark):
    # 5 clean daily cycles, then one hour jumps far off-pattern
    hours = 5 * 24
    rows = []
    for i in range(hours):
        day, hr = divmod(i, 24)
        v = 100.0 + 10.0 * math.sin(hr / 24 * 2 * math.pi)
        if i == 100:
            v += 200.0
        rows.append(
            ("m", f"2024-03-{day + 1:02d} {hr:02d}:00:00", i, v)
        )
    s = spark.createDataFrame(
        rows, "metric string, ts string, seq long, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = wave8.holt_winters_anomalies(s).toPandas()
    assert len(out) >= 1
    top = out.loc[out["resid_z"].abs().idxmax()]
    assert top["ts_hour"].hour == 100 % 24 and top["ts_hour"].day == 100 // 24 + 1
    out7 = wave8.holt_winters_anomalies(s.repartition(7)).toPandas()
    pd.testing.assert_frame_equal(
        out.sort_values("ts_hour").reset_index(drop=True),
        out7.sort_values("ts_hour").reset_index(drop=True),
    )


def test_hw_short_series_yields_empty(spark):
    rows = [("m", f"2024-03-01 {h:02d}:00:00", h, float(h)) for h in range(12)]
    s = spark.createDataFrame(
        rows, "metric string, ts string, seq long, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    assert wave8.holt_winters_anomalies(s).count() == 0


# ------------------------------------------------- centroid drift

def test_centroid_drift_matches_numpy(spark):
    got = {
        r.label: r
        for r in wave8.q_embedding_centroid_drift(spark, SF_SMALL).collect()
    }
    emb = load_table(spark, SF_SMALL, "embeddings").toPandas()
    cut = np.percentile(emb["vec_id"], 50)
    vecs = np.stack(emb["embedding"].to_numpy()).astype("float64")
    for label, g in emb.groupby("label"):
        a = vecs[g.index[g["vec_id"] < cut]]
        bm = vecs[g.index[g["vec_id"] >= cut]]
        r = got[label]
        assert (r.n_a, r.n_b) == (len(a), len(bm))
        ca, cb = a.mean(axis=0), bm.mean(axis=0)
        cos = ca @ cb / (np.linalg.norm(ca) * np.linalg.norm(cb))
        assert r.centroid_cosine == pytest.approx(cos, abs=1e-5)
        assert r.centroid_l2 == pytest.approx(
            np.linalg.norm(ca - cb), abs=1e-5
        )


def test_sax_motifs_wellformed(spark):
    out = wave8.q_metric_sax_motifs(spark, SF_SMALL).toPandas()
    assert len(out) > 0
    motifs = out[out["kind"] == "motif"]
    novel = out[out["kind"] == "novel"]
    assert (motifs["n_days"] >= 2).all()
    assert (novel["n_days"] == 1).all()
    # at most SAX_MOTIF_TOP motifs per series, ranked by recurrence
    per = motifs.groupby("metric").size()
    assert (per <= wave8.SAX_MOTIF_TOP).all()
    # every motif recurs at least as often as any novel word (trivially)
    # and the full word-frequency frame is recovered by the union
    freq = (
        wave8.sax_symbols(events_series(spark, SF_SMALL))
        .groupBy("metric", "word")
        .count()
        .toPandas()
    )
    assert len(novel) == (freq["count"] == 1).sum()


def test_sax_motifs_constructed_recurrence(spark):
    # days 1-2 share one shape (motif), day 3 is unique (novel)
    rows = []
    for day, highs in [(1, (2, 3)), (2, (2, 3)), (3, (0, 1))]:
        for h in range(4):
            v = 10.0 if h in highs else 0.0
            rows.append(("m", f"2024-03-0{day} {h:02d}:00:00", h, v))
    s = spark.createDataFrame(
        rows, "metric string, ts string, seq long, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {(r.kind, r.word): r.n_days for r in wave8.sax_motifs(s).collect()}
    assert out[("motif", "aadd")] == 2
    assert [k for k in out if k[0] == "novel"] == [("novel", "ddaa")]


def test_hw_threshold_parameter_is_respected(spark):
    # regression: the z kwarg must drive the flag filter (a looser
    # threshold admits strictly more rows on the same series)
    rows = [
        ("m", f"2024-03-{1 + i // 24:02d} {i % 24:02d}:00:00", i,
         100.0 + 10.0 * math.sin(i % 24 / 24 * 2 * math.pi)
         + (50.0 if i == 60 else 0.0))
        for i in range(72)
    ]
    s = spark.createDataFrame(
        rows, "metric string, ts string, seq long, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    tight = wave8.holt_winters_anomalies(s, z=wave8.HW_Z).count()
    loose = wave8.holt_winters_anomalies(s, z=0.1).count()
    assert loose > tight


# ------------------------------------------------- invariance properties

def test_sax_affine_invariance(spark):
    """z-normalization makes SAX words invariant to positive affine
    transforms of the series: sax(a*x + b) == sax(x) for a > 0."""
    s = events_series(spark, SF_SMALL)
    base = {
        (r.metric, r.day): r.word for r in wave8.sax_symbols(s).collect()
    }
    scaled = s.withColumn("value", F.col("value") * 37.5 + 1000.0)
    got = {
        (r.metric, r.day): r.word
        for r in wave8.sax_symbols(scaled).collect()
    }
    assert got == base and len(base) > 0


def test_pmi_duplication_invariance(spark):
    """Duplicating every document doubles all counts but leaves every
    PMI ratio unchanged: (2c_xy * 2N) / (2c_x * 2c_y) = c_xy*N/(c_x*c_y)."""
    docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "text")
    doubled = docs.unionByName(
        docs.withColumn("doc_id", F.col("doc_id") + 1_000_000)
    )
    base = {
        (r.w1, r.w2): r.pmi
        for r in wave8.pmi_collocations(docs, min_count=2, top_k=50).collect()
    }
    got = {
        (r.w1, r.w2): r.pmi
        for r in wave8.pmi_collocations(
            doubled, min_count=4, top_k=50
        ).collect()
    }
    assert set(got) == set(base) and len(base) > 0
    for k, v in base.items():
        assert got[k] == pytest.approx(v, abs=2e-6)


def test_feature_hashing_closed_form(spark):
    # d0 = "a a b", d1 = "b c"; n_docs=2; df: a=1, b=2, c=1
    # weights: d0/bucket(a) = 2 ln 2, d0/bucket(b) = 0,
    #          d1/bucket(c) = ln 2,  d1/bucket(b) = 0
    # buckets (md5 % 512): a=441, b=510, c=240 — no collisions
    docs = spark.createDataFrame(
        [(0, "a a b"), (1, "b c")], "doc_id long, text string"
    )
    got = {
        (r.doc_id, r.bucket): (r.weight, r.rk)
        for r in wave8.feature_hashing_topk(docs).collect()
    }
    ln2 = round(math.log(2), 6)
    assert got[(0, 441)] == (round(2 * math.log(2), 6), 1)
    assert got[(0, 510)] == (0.0, 2)
    assert got[(1, 240)] == (ln2, 1)
    assert got[(1, 510)] == (0.0, 2)
    assert len(got) == 4


# ------------------------------------------------- PCA reconstruction

def test_pca_scores_match_numpy_and_rank_planted_anomaly(spark):
    # 2-D structure in 3 columns + one row far OFF the principal plane
    rng = np.random.default_rng(3)
    t = rng.normal(0, 1, (200, 2))
    x = np.column_stack([t[:, 0], t[:, 1], 0.2 * t[:, 0] - 0.1 * t[:, 1]])
    # off-subspace spike: big enough to rank top-1, small enough not
    # to rotate the FITTED subspace toward itself (PCA on contaminated
    # data absorbs a dominant outlier direction into the top PCs)
    x[17] += np.array([0.0, 0.0, 5.0])
    rows = [
        (f"2024-01-01 {i // 60:02d}:{i % 60:02d}:00", *map(float, x[i]))
        for i in range(len(x))
    ]
    df = spark.createDataFrame(
        rows, "ts string, f0 double, f1 double, f2 double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = (
        wave8.pca_anomaly_scores(df, ["f0", "f1", "f2"], k=2)
        .toPandas()
        .sort_values("ts")
        .reset_index(drop=True)
    )
    # exact numpy replica
    mu = x.mean(axis=0)
    cov = np.cov(x.T, bias=True)
    vals, vecs = np.linalg.eigh(cov)
    comps = vecs[:, np.argsort(vals)[::-1][:2]].T
    q = np.eye(3) - comps.T @ comps
    want = np.einsum("nd,de,ne->n", x - mu, q, x - mu)
    np.testing.assert_allclose(got["pca_err"], np.round(want, 8), atol=1e-6)
    assert got["pca_err"].idxmax() == 17
    assert got["pca_err"][17] > 100 * np.median(got["pca_err"].drop(17))


def test_pca_scores_registry_query_runs(spark):
    out = wave8.q_metric_pca_scores(spark, SF_SMALL).toPandas()
    assert len(out) > 0 and (out["pca_err"] >= 0).all()


def test_knn_label_audit_matches_bruteforce(spark):
    got = {
        r.q_id: r
        for r in wave8.q_embedding_knn_label_audit(spark, SF_SMALL).collect()
    }
    emb = load_table(spark, SF_SMALL, "embeddings").toPandas()
    vecs = np.stack(emb["embedding"].to_numpy()).astype("float64")
    norms = np.sqrt((vecs * vecs).sum(axis=1))
    labels = emb["label"].to_numpy()
    ids = emb["vec_id"].to_numpy()
    order = np.argsort(ids)
    vecs, norms, labels, ids = (
        vecs[order], norms[order], labels[order], ids[order]
    )
    import collections

    for qi in np.nonzero(ids < wave8.KNN_AUDIT_ANCHORS)[0]:
        den = norms * norms[qi]
        with np.errstate(divide="ignore", invalid="ignore"):
            cos = vecs @ vecs[qi] / np.where(den == 0, np.nan, den)
        cos[qi] = np.nan
        valid = ~np.isnan(cos)
        cand = np.nonzero(valid)[0]
        topk = cand[np.lexsort((ids[cand], -cos[cand]))][: wave8.KNN_AUDIT_K]
        cnt = collections.Counter(labels[t] for t in topk)
        knn_label = min(cnt, key=lambda l: (-cnt[l], l))
        r = got[ids[qi]]
        assert (r.knn_label, r.n_votes) == (knn_label, cnt[knn_label])
        assert r.own_label == labels[qi]
        assert r.suspect == int(labels[qi] != knn_label)
    assert len(got) == wave8.KNN_AUDIT_ANCHORS


def test_sax_mindist_closed_form(spark):
    # three archive days vs query day "aadd" (same 4-segment shape):
    # identical word -> 0; one a->b flip (adjacent) -> 0; one a->d
    # flip -> full-span cost 2*0.6745
    rows = []
    shapes = {1: (2, 3), 2: (2, 3), 3: (2, 3), 4: (2, 3)}
    for day, highs in shapes.items():
        for h in range(4):
            base = 10.0 if h in highs else 0.0
            rows.append(("m", f"2024-03-0{day} {h:02d}:00:00", h, base))
    s = spark.createDataFrame(
        rows, "metric string, ts string, seq long, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = wave8.sax_similar_days(s).collect()
    # all archive days share the query's word -> mindist 0, ranked by day
    assert [(r.day.day, r.mindist, r.rk) for r in out] == [
        (1, 0.0, 1),
        (2, 0.0, 2),
        (3, 0.0, 3),
    ]
    # and a direct closed-form check of the distance fold itself
    d = spark.range(1).select(
        F.expr(wave8._mindist_expr("'aadd'", "'aadd'")).alias("same"),
        F.expr(wave8._mindist_expr("'aadd'", "'badd'")).alias("adj"),
        F.expr(wave8._mindist_expr("'aadd'", "'dadd'")).alias("far"),
    ).first()
    assert d.same == 0.0 and d.adj == 0.0
    assert d.far == pytest.approx(2 * 0.6744897501960817, abs=1e-9)


def test_km_curve_matches_manual_estimator(spark):
    got = (
        wave8.q_orders_km_reorder_curve(spark, SF_SMALL)
        .toPandas()
        .sort_values("dur_days")
        .reset_index(drop=True)
    )
    orders = load_table(spark, SF_SMALL, "orders").toPandas()
    orders = orders.sort_values(["o_custkey", "o_orderdate", "o_orderkey"])
    horizon = orders["o_orderdate"].max().normalize()
    durs, events = [], []
    for _, g in orders.groupby("o_custkey"):
        dates = g["o_orderdate"].dt.normalize().tolist()
        for a, b in zip(dates, dates[1:]):
            durs.append((b - a).days)
            events.append(1)
        durs.append((horizon - dates[-1]).days)
        events.append(0)
    durs, events = np.array(durs), np.array(events)
    want = []
    s = 1.0
    for t in sorted({int(t) for t in durs[events == 1]}):
        n_risk = int((durs >= t).sum())
        d = int(((durs == t) & (events == 1)).sum())
        s *= 1 - d / n_risk
        want.append((t, n_risk, d, round(s, 6)))
    got_rows = [
        (r.dur_days, r.n_risk, r.n_events, r.survival)
        for r in got.itertuples()
    ]
    assert len(got_rows) == len(want)
    for (gt, gn, gd, gs), (wt, wn, wd, ws) in zip(got_rows, want):
        assert (gt, gn, gd) == (wt, wn, wd)
        assert gs == pytest.approx(ws, abs=1e-6)
    # survival is monotone non-increasing and starts below 1
    surv = got["survival"].tolist()
    assert all(a >= b - 1e-9 for a, b in zip(surv, surv[1:]))
    assert surv[0] < 1.0


def test_cuped_reduces_variance_and_preserves_means(spark):
    out = {
        r.variant: r
        for r in wave8.q_events_ab_cuped(spark, SF_SMALL).collect()
    }
    assert set(out) == {0, 1}
    for r in out.values():
        # CUPED must not bias the metric: adjusted mean ~= raw mean
        # pooled across variants (per-variant means shift only by the
        # variant's covariate imbalance, which is what CUPED corrects)
        assert r.var_y_adj <= r.var_y + 1e-9
        assert 0.0 <= r.var_reduction <= 1.0
    # the pooled adjusted mean equals the pooled raw mean exactly
    # (sum of theta*(x - mean_x) over ALL users is zero)
    n0, n1 = out[0].n_users, out[1].n_users
    pooled_raw = (out[0].mean_y * n0 + out[1].mean_y * n1) / (n0 + n1)
    pooled_adj = (
        out[0].mean_y_adj * n0 + out[1].mean_y_adj * n1
    ) / (n0 + n1)
    import pytest as _pt

    assert pooled_adj == _pt.approx(pooled_raw, abs=1e-4)


def test_ab_power_consistent_with_cuped(spark):
    power = wave8.q_events_ab_power(spark, SF_SMALL).first()
    cuped = {
        r.variant: r
        for r in wave8.q_events_ab_cuped(spark, SF_SMALL).collect()
    }
    assert power.n_required_cuped <= power.n_required_raw
    # the savings share IS the control variance reduction (delta cancels)
    want = 1 - cuped[0].var_y_adj / cuped[0].var_y
    assert power.users_saved_share == pytest.approx(want, abs=1e-5)
    assert power.n_required_raw > 0 and power.mde_abs > 0


def test_df_stationarity_matches_numpy_ols_and_separates_processes(spark):
    rng = np.random.default_rng(11)
    n = 400
    # stationary AR(1) (mean-reverting) vs a pure random walk
    ar = np.zeros(n)
    for t in range(1, n):
        ar[t] = 0.5 * ar[t - 1] + rng.normal()
    rw = np.cumsum(rng.normal(size=n))
    rows = []
    for name, series in [("ar", ar), ("rw", rw)]:
        for i, v in enumerate(series):
            ts = (
                pd.Timestamp("2024-03-01")
                + pd.Timedelta(hours=int(i))
            ).strftime("%Y-%m-%d %H:%M:%S")
            rows.append((name, ts, i, float(v)))
    s = spark.createDataFrame(
        rows, "metric string, ts string, seq long, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {r.metric: r for r in wave8.df_stationarity(s).collect()}
    # numpy replica of the closed form for the AR series
    x, d = ar[:-1], np.diff(ar)
    X = np.column_stack([np.ones(len(x)), x])
    beta, *_ = np.linalg.lstsq(X, d, rcond=None)
    resid = d - X @ beta
    s2 = (resid @ resid) / (len(x) - 2)
    se = np.sqrt(s2 / ((x - x.mean()) @ (x - x.mean())))
    tau = beta[1] / se
    assert got["ar"].df_tau == pytest.approx(tau, abs=1e-4)
    # the AR(1) rejects the unit root decisively; the walk does not
    assert got["ar"].stationary_5pct == 1
    assert got["ar"].df_tau < -5
    assert got["rw"].stationary_5pct == 0
