"""PromQL compiler pins: parser shape, lowering equivalence against
the direct operator calls, offset/scalar/filter semantics, and the
grammar's error surface."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from prometheus_anomaly_detection_lstm_spark.operators import promql_lang as L
from prometheus_anomaly_detection_lstm_spark.operators.promql import counter_rate

from .conftest import SF_SMALL


def _samples(spark):
    return L._labeled(spark, SF_SMALL)


# ---------------------------------------------------------------- parser

def test_parse_full_expression_shape():
    ast = L.parse('sum by (label) (rate(m_total{job="api",l=~"a.*"}[5m] offset 1h))')
    assert isinstance(ast, L.Agg) and ast.op == "sum" and ast.by == ["label"]
    f = ast.arg
    assert isinstance(f, L.Func) and f.name == "rate"
    assert f.arg.metric == "m_total"
    assert f.arg.matchers == [("job", "=", "api"), ("l", "=~", "a.*")]
    assert f.arg.range_s == 300 and f.arg.offset_s == 3600


def test_parse_trailing_by_and_topk_and_scalar():
    ast = L.parse("avg (rate(m[2m])) by (l)")
    assert isinstance(ast, L.Agg) and ast.by == ["l"]
    ast = L.parse("topk(5, sum(increase(m[1m])))")
    assert ast.op == "topk" and ast.k == 5
    ast = L.parse("2 * rate(m[1m])")
    assert isinstance(ast, L.BinOp) and ast.scalar_left and ast.scalar == 2.0
    ast = L.parse("rate(m[1m]) > 0.5")
    assert isinstance(ast, L.BinOp) and ast.op == ">" and not ast.scalar_left


@pytest.mark.parametrize(
    "bad",
    [
        "rate(m)",                       # range function without [d]
        "sum by (l) (rate(m[5m])",       # unbalanced paren
        "m{label~\"x\"}",                # bad matcher op
        "a / on (job) b / on (x) c",     # chained vector binops
        "m [5m] extra",                  # trailing tokens
    ],
)
def test_parse_rejects(bad):
    with pytest.raises(ValueError):
        L.parse(bad)


# ------------------------------------------------------------- lowering

def test_rate_lowering_matches_direct_operator(spark):
    s = _samples(spark)
    via_lang = (
        L.eval_promql("rate(click[10m])", s)
        .select("metric", "label", "w_start", "value")
    )
    direct = counter_rate(
        s.filter(F.col("metric") == "click"),
        bucket_s=600,
        series_cols=("metric", "label"),
    ).select("metric", "label", "w_start", F.col("rate_per_s").alias("value"))
    assert via_lang.exceptAll(direct).count() == 0
    assert direct.exceptAll(via_lang).count() == 0
    assert via_lang.count() > 0


def test_offset_shifts_buckets_exactly(spark):
    s = _samples(spark)
    base = L.eval_promql("increase(error[10m])", s)
    off = L.eval_promql("increase(error[10m] offset 10m)", s)
    shifted = base.select(
        "metric",
        "label",
        (F.col("w_start") + F.expr("INTERVAL 600 SECONDS")).alias("w_start"),
        "value",
    )
    assert off.exceptAll(shifted).count() == 0
    assert shifted.exceptAll(off).count() == 0


def test_scalar_arithmetic_and_comparison_filter(spark):
    s = _samples(spark)
    doubled = L.eval_promql("2 * sum(increase(view[10m]))", s).toPandas()
    plain = L.eval_promql("sum(increase(view[10m]))", s).toPandas()
    m = plain.merge(doubled, on="w_start", suffixes=("_1", "_2"))
    assert len(m) == len(plain)
    # buckets whose only delta is the series' first sample sum to NULL
    # in BOTH variants (PromQL increase is undefined there)
    assert (m.value_2.isna() == m.value_1.isna()).all()
    m = m.dropna()
    assert len(m) > 0
    # 2*round(x,6) vs round(2x,6) differ by at most one ulp of the 6th dp
    assert (abs(m.value_2 - 2 * m.value_1) <= 1.0e-6).all()
    thresh = L.eval_promql("sum(increase(view[10m])) > 100", s).toPandas()
    assert (thresh.value > 100).all()
    assert len(thresh) < len(plain)  # the filter actually filters


def test_instant_selector_is_last_sample_per_step(spark):
    s = _samples(spark)
    got = L.eval_promql('signup{label="3"}', s).toPandas()
    want = (
        s.filter((F.col("metric") == "signup") & (F.col("label") == 3))
        .groupBy(F.window("ts", "600 seconds").start.alias("w_start"))
        .agg(
            F.round(
                F.expr("max_by(value, named_struct('t', ts, 's', seq))"), 6
            ).alias("value")
        )
        .toPandas()
    )
    m = got.merge(want, on="w_start", suffixes=("_g", "_w"))
    assert len(m) == len(want) == len(got) > 0
    assert (abs(m.value_g - m.value_w) < 1e-9).all()


def test_matcher_negation_and_count(spark):
    s = _samples(spark)
    neg = L.eval_promql('count(count_over_time(click{label!="0"}[1h]))', s)
    rows = neg.toPandas()
    # 10 labels minus the excluded one, where present in the hour
    assert rows.value.max() <= 9
    assert rows.value.min() >= 1


def test_vector_ratio_matches_manual_join(spark):
    """err/total ratio: 1:1 matched on (label, bucket), __name__
    dropped before matching, NULL on zero denominators."""
    s = _samples(spark)
    expr = (
        "sum by (label) (increase(error[6h]))"
        " / sum by (label) (increase(click[6h]))"
    )
    got = L.eval_promql(expr, s).toPandas()
    num = L.eval_promql("sum by (label) (increase(error[6h]))", s).toPandas()
    den = L.eval_promql("sum by (label) (increase(click[6h]))", s).toPandas()
    man = num.merge(den, on=["label", "w_start"], suffixes=("_n", "_d"))
    man["want"] = man.value_n / man.value_d.where(man.value_d != 0)
    m = got.merge(man, on=["label", "w_start"])
    assert len(m) == len(got) == len(man) > 0
    both = m.dropna(subset=["value", "want"])
    # inner values are rounded to 6dp, the ratio once more — one ulp
    assert (abs(both.value - both.want.round(6)) <= 1e-6).all()
    assert (m.value.isna() == m.want.isna()).all()


def test_vector_comparison_filters_left(spark):
    s = _samples(spark)
    base = L.eval_promql("sum by (label) (increase(error[6h]))", s).toPandas()
    kept = L.eval_promql(
        "sum by (label) (increase(error[6h]))"
        " > sum by (label) (increase(click[6h]))",
        s,
    ).toPandas()
    assert 0 < len(kept) < len(base)
    # every kept row carries the LEFT vector's value
    m = kept.merge(base, on=["label", "w_start"], suffixes=("_k", "_b"))
    assert len(m) == len(kept)
    assert (abs(m.value_k - m.value_b) < 1e-9).all()


def test_vector_on_clause_restricts_match_keys(spark):
    s = _samples(spark)
    a = L.eval_promql(
        "sum by (label) (increase(error[6h]))"
        " / on (label) sum by (label) (increase(click[6h]))",
        s,
    )
    b = L.eval_promql(
        "sum by (label) (increase(error[6h]))"
        " / sum by (label) (increase(click[6h]))",
        s,
    )
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    with pytest.raises(ValueError):
        L.eval_promql(
            "sum by (label) (increase(error[10m]))"
            " / on (job) sum by (label) (increase(click[6h]))",
            s,
        )


def test_histogram_quantile_lowering_matches_operator(spark):
    from prometheus_anomaly_detection_lstm_spark.operators.promql import (
        histogram_quantile,
    )

    s = _samples(spark)
    via_lang = L.eval_promql(
        "histogram_quantile(0.9, rate(view[30m]))", s
    )
    direct = histogram_quantile(
        s.filter(F.col("metric") == "view").select("metric", "ts", "value"),
        q=0.9,
        bucket_s=1800,
    ).select("metric", "w_start", F.col("p90_est").alias("value"))
    assert via_lang.exceptAll(direct).count() == 0
    assert direct.exceptAll(via_lang).count() == 0
    assert via_lang.count() > 0
    with pytest.raises(ValueError):
        L.parse("histogram_quantile(0.9, view)")  # needs rate(sel[d])


def test_topk_bounds_rows_per_bucket(spark):
    s = _samples(spark)
    got = L.eval_promql("topk(2, avg_over_time(view[30m]))", s).toPandas()
    per_bucket = got.groupby("w_start").size()
    assert (per_bucket <= 2).all()
    assert (per_bucket > 0).any()


def test_cli_query_subcommand(spark, tmp_path):
    """`prometheus-ad-spark query --expr ... --input <samples parquet>`
    writes the compiled result — the config-string-to-lake path."""
    from prometheus_anomaly_detection_lstm_spark.cli import main

    src = str(tmp_path / "samples")
    out = str(tmp_path / "out")
    _samples(spark).write.parquet(src)
    main(
        [
            "query",
            "--expr",
            "sum by (label) (increase(click[1h]))",
            "--input",
            src,
            "--output",
            out,
        ]
    )
    got = spark.read.parquet(out)
    want = L.eval_promql(
        "sum by (label) (increase(click[1h]))", _samples(spark)
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    assert got.count() > 0
    with pytest.raises(SystemExit):
        main(["query", "--expr", "rate(m[5m])"])  # missing --input


def test_without_clause_complements_by(spark):
    """`sum without (x)` groups by every label except x and __name__ —
    with a single extra label, equivalent to the bare `sum(...)`; with
    none excluded, equivalent to grouping by that label."""
    s = _samples(spark)
    a = L.eval_promql("sum without (label) (increase(view[1h]))", s)
    b = L.eval_promql("sum(increase(view[1h]))", s)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    c = L.eval_promql("sum without (nosuch) (increase(view[1h]))", s)
    d = L.eval_promql("sum by (label) (increase(view[1h]))", s)
    assert c.exceptAll(d).count() == 0 and d.exceptAll(c).count() == 0
    ast = L.parse("avg without (l1, l2) (rate(m[5m]))")
    assert ast.without == ["l1", "l2"] and ast.by == []


def test_scalar_left_comparison_keeps_correct_side(spark):
    """`100 > v` must keep samples where value < 100 — the review
    found the operands inverted; this pins the fix (and its dual)."""
    s = _samples(spark)
    below = L.eval_promql("100 > sum(increase(view[6h]))", s).toPandas()
    above = L.eval_promql("sum(increase(view[6h])) > 100", s).toPandas()
    total = L.eval_promql("sum(increase(view[6h]))", s).toPandas().dropna()
    assert (below.value < 100).all()
    assert (above.value > 100).all()
    assert len(below) + len(above) == len(total[total.value != 100])
    assert len(below) > 0 and len(above) > 0


def test_quantile_and_stddev_over_time(spark):
    s = _samples(spark)
    p95 = L.eval_promql("quantile_over_time(0.95, view[1h])", s).toPandas()
    mx = L.eval_promql("max_over_time(view[1h])", s).toPandas()
    m = p95.merge(mx, on=["metric", "label", "w_start"], suffixes=("_q", "_m"))
    assert len(m) == len(p95) > 0
    assert (m.value_q <= m.value_m + 1e-9).all()
    sd = L.eval_promql("stddev_over_time(view[1h])", s).toPandas()
    var = L.eval_promql("stdvar_over_time(view[1h])", s).toPandas()
    m2 = sd.merge(var, on=["metric", "label", "w_start"], suffixes=("_s", "_v"))
    # population stddev^2 == stdvar (both rounded to 6dp -> 1e-5 slack)
    assert (abs(m2.value_s**2 - m2.value_v) < 1e-4).all()
    agg = L.eval_promql("stddev(last_over_time(view[1h]))", s).toPandas()
    assert (agg.value >= 0).all() and len(agg) > 0


def test_math_functions_elementwise(spark):
    s = _samples(spark)
    base = L.eval_promql("sum by (label) (increase(view[6h]))", s).toPandas()
    clamped = L.eval_promql(
        "clamp_max(sum by (label) (increase(view[6h])), 50)", s
    ).toPandas()
    m = base.merge(clamped, on=["label", "w_start"], suffixes=("_b", "_c"))
    assert len(m) == len(base) > 0
    both = m.dropna()
    assert (both.value_c == both.value_b.clip(upper=50.0)).all()
    sq = L.eval_promql("sqrt(sum by (label) (increase(view[6h])))", s).toPandas()
    m2 = base.merge(sq, on=["label", "w_start"], suffixes=("_b", "_s")).dropna()
    assert (abs(m2.value_s - m2.value_b.pow(0.5).round(6)) <= 1e-6).all()
    ast = L.parse("clamp_min(abs(rate(m[5m])), 0.5)")
    assert ast.name == "clamp_min" and ast.arg.name == "abs"
    with pytest.raises(ValueError):
        L.parse("clamp_min(rate(m[5m]))")  # missing bound


def test_label_replace_and_join_semantics(spark):
    s = _samples(spark)
    rep = L.eval_promql(
        'label_replace(last_over_time(click[6h]),'
        ' "bucket", "lo$1", "label", "([0-4])")',
        s,
    ).toPandas()
    # matched labels get the captured substitution, others keep "" (no
    # pre-existing dst column)
    matched = rep[rep.label.isin([0, 1, 2, 3, 4])]
    assert (matched.bucket == "lo" + matched.label.astype(int).astype(str)).all()
    assert (rep[~rep.label.isin([0, 1, 2, 3, 4])].bucket == "").all()
    joined = L.eval_promql(
        'label_join(last_over_time(click[6h]),'
        ' "series_id", ":", "metric", "label")',
        s,
    ).toPandas()
    want = joined.metric + ":" + joined.label.astype("Int64").astype(str)
    assert (joined.series_id == want).all()
    with pytest.raises(ValueError):
        L.parse('label_replace(m, "d", "r", "s")')  # missing regex arg


def test_bottomk_is_topk_dual(spark):
    s = _samples(spark)
    top = L.eval_promql("topk(2, avg_over_time(view[6h]))", s).toPandas()
    bot = L.eval_promql("bottomk(2, avg_over_time(view[6h]))", s).toPandas()
    per = bot.groupby("w_start").size()
    assert (per <= 2).all()
    full = L.eval_promql("avg_over_time(view[6h])", s).toPandas()
    for w, grp in full.groupby("w_start"):
        want_bot = sorted(grp.value)[:2]
        got_bot = sorted(bot[bot.w_start == w].value)
        assert got_bot == pytest.approx(want_bot), w
        want_top = sorted(grp.value, reverse=True)[:2]
        got_top = sorted(top[top.w_start == w].value, reverse=True)
        assert got_top == pytest.approx(want_top), w


def test_absent_flags_only_empty_buckets(spark):
    s = _samples(spark)
    gaps = L.eval_promql('absent(click{label="3"}[1d])', s).toPandas()
    present = L.eval_promql(
        'count(count_over_time(click{label="3"}[1d]))', s
    ).toPandas()
    # absent days and present days partition the corpus' day grid
    overlap = set(gaps.w_start) & set(present.w_start)
    assert not overlap
    full = L.eval_promql("count(count_over_time(click[1d]))", s).toPandas()
    assert len(gaps) + len(present) >= len(full)  # grid spans the corpus
    assert (gaps.value == 1.0).all()
    # a selector matching nothing is absent EVERYWHERE on the grid
    all_gone = L.eval_promql('absent(click{label="99"}[1d])', s).toPandas()
    assert len(all_gone) >= len(full)


def test_review_fixes_negative_bounds_nulls_arity_dollars(spark):
    s = _samples(spark)
    # negative clamp bound and negative comparison scalar now parse
    neg = L.eval_promql("clamp_min(delta(view[6h]), -5)", s).toPandas()
    assert (neg.value.dropna() >= -5).all()
    kept = L.eval_promql("delta(view[6h]) > -1000", s)
    assert kept.count() > 0
    # bottomk never surfaces NULL-valued samples
    bk = L.eval_promql("bottomk(1, increase(view[6h]))", s).toPandas()
    assert bk.value.notna().all()
    # literal '$' in a replacement is tolerated (PromQL Expand), not a crash
    lit = L.eval_promql(
        'label_replace(last_over_time(click[6h]),'
        ' "unit", "$ per s", "label", "(.*)")',
        s,
    ).toPandas()
    assert (lit.unit == "$ per s").all()
    # arity and q-range errors surface at parse as ValueError
    for bad in (
        'label_replace(m, "d", "r", "s", "x", "extra")',
        "quantile_over_time(1.5, m[5m])",
        "histogram_quantile(2, rate(m[5m]))",
    ):
        with pytest.raises(ValueError):
            L.parse(bad)


def test_deriv_and_predict_linear_lowering_match_operator(spark):
    s = _samples(spark).select("metric", "ts", "seq", "value")
    from prometheus_anomaly_detection_lstm_spark.operators.promql import (
        deriv_predict,
    )

    direct = deriv_predict(
        s.filter(F.col("metric") == "view"), horizon_s=300, bucket_s=300
    )
    via_deriv = L.eval_promql("deriv(view[5m])", s).select(
        "metric", "w_start", F.col("value").alias("slope_per_s")
    )
    d = direct.select("metric", "w_start", "slope_per_s")
    assert via_deriv.exceptAll(d).count() == 0
    assert d.exceptAll(via_deriv).count() == 0
    via_pred = L.eval_promql("predict_linear(view[5m], 300)", s).select(
        "metric", "w_start", F.col("value").alias("predicted")
    )
    p = direct.select("metric", "w_start", "predicted")
    assert via_pred.exceptAll(p).count() == 0
    assert p.exceptAll(via_pred).count() == 0
    assert via_pred.count() > 0


def test_changes_lowering_matches_operator(spark):
    s = _samples(spark)
    from prometheus_anomaly_detection_lstm_spark.operators.promql import (
        changes_resets,
    )

    direct = changes_resets(
        s.filter(F.col("metric") == "click"),
        bucket_s=600,
        series_cols=("metric", "label"),
    ).select(
        "metric",
        "label",
        "w_start",
        F.col("changes").cast("double").alias("value"),
    )
    via = L.eval_promql("changes(click[10m])", s).select(
        "metric", "label", "w_start", "value"
    )
    assert via.exceptAll(direct).count() == 0
    assert direct.exceptAll(via).count() == 0
    assert via.count() > 0


def test_quantile_aggregator_matches_manual(spark):
    s = _samples(spark)
    via = L.eval_promql(
        "quantile by (label) (0.9, avg_over_time(view[10m]))", s
    )
    inner = L.eval_promql("avg_over_time(view[10m])", s)
    manual = inner.groupBy("label", "w_start").agg(
        F.round(F.expr("percentile(value, 0.9D)"), 6).alias("value")
    )
    assert via.exceptAll(manual).count() == 0
    assert manual.exceptAll(via).count() == 0
    assert via.count() > 0


def test_round_and_sgn_semantics(spark):
    # one metric per sample so the instant selector keeps all of them
    s = spark.createDataFrame(
        [
            ("a", "2024-03-01 00:00:00", 0, -7.5),
            ("b", "2024-03-01 00:00:00", 1, 14.9),
            ("c", "2024-03-01 00:00:00", 2, 0.0),
        ],
        "metric string, ts string, seq long, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    ten = {
        r.metric: r.value
        for m in "abc"
        for r in L.eval_promql(f"round({m}, 10)", s).collect()
    }
    # Go math.Round(v/to)*to: -7.5/10=-0.75 -> -1 -> -10; 14.9 -> 10
    assert ten == {"a": -10.0, "b": 10.0, "c": 0.0}
    one = {
        r.metric: r.value
        for m in "abc"
        for r in L.eval_promql(f"round({m})", s).collect()
    }
    assert one == {"a": -7.0, "b": 15.0, "c": 0.0}  # ties round UP
    sg = {
        r.metric: r.value
        for m in "abc"
        for r in L.eval_promql(f"sgn({m})", s).collect()
    }
    assert sg == {"a": -1.0, "b": 1.0, "c": 0.0}


def test_set_operators_semantics(spark):
    s = _samples(spark)
    left = L.eval_promql("avg_over_time(view[1h])", s)
    right = L.eval_promql(
        'avg_over_time(click{label=~"[0-4]"}[1h])', s
    )
    both = L.eval_promql(
        'avg_over_time(view[1h]) and on (label) '
        'avg_over_time(click{label=~"[0-4]"}[1h])',
        s,
    )
    neither = L.eval_promql(
        'avg_over_time(view[1h]) unless on (label) '
        'avg_over_time(click{label=~"[0-4]"}[1h])',
        s,
    )
    # and/unless == manual semi/anti joins on (label, w_start), and
    # they partition the left vector exactly
    keys = ["label", "w_start"]
    want_both = left.join(
        right.select(*keys).distinct(), keys, "left_semi"
    ).select(*left.columns)
    want_neither = left.join(
        right.select(*keys).distinct(), keys, "left_anti"
    ).select(*left.columns)
    assert both.exceptAll(want_both).count() == 0
    assert want_both.exceptAll(both).count() == 0
    assert neither.exceptAll(want_neither).count() == 0
    assert want_neither.exceptAll(neither).count() == 0
    assert both.count() + neither.count() == left.count()
    assert both.count() > 0 and neither.count() > 0
    # or: left wins, right fills the gaps — union is exact per labelset
    merged = L.eval_promql(
        'avg_over_time(view{label=~"[0-4]"}[1h]) or '
        "avg_over_time(click[1h])",
        s,
    )
    lhs = L.eval_promql('avg_over_time(view{label=~"[0-4]"}[1h])', s)
    rhs = L.eval_promql("avg_over_time(click[1h])", s)
    # matching drops __name__ (PromQL): click fills only labelsets
    # with NO view sample in that bucket, metric name ignored
    filled = rhs.join(
        lhs.select("label", "w_start").distinct(),
        ["label", "w_start"],
        "left_anti",
    ).select(*lhs.columns)
    assert merged.count() == lhs.count() + filled.count()
    assert merged.exceptAll(lhs.unionByName(filled)).count() == 0


def test_bool_modifier_returns_indicator(spark):
    s = _samples(spark)
    plain = L.eval_promql("avg_over_time(view[1h]) > 100", s)
    boolv = L.eval_promql("avg_over_time(view[1h]) > bool 100", s)
    base = L.eval_promql("avg_over_time(view[1h])", s)
    # bool keeps EVERY sample, value collapses to the 0/1 indicator
    assert boolv.count() == base.count()
    assert {r.value for r in boolv.collect()} <= {0.0, 1.0}
    ones = boolv.filter(F.col("value") == 1.0).count()
    assert ones == plain.count()
    # vector-vector bool comparison too
    vb = L.eval_promql(
        "avg_over_time(view[1h]) >= bool avg_over_time(click[1h])", s
    )
    assert {r.value for r in vb.collect()} <= {0.0, 1.0}
    assert vb.count() > 0


def test_group_left_is_accepted_for_many_to_one(spark):
    s = _samples(spark)
    # per-label rate share of the label's total: M:1 on (label)
    via = L.eval_promql(
        "rate(click[1h]) / on (label) group_left "
        "sum by (label) (rate(click[1h]))",
        s,
    )
    assert via.count() > 0
    vals = [r.value for r in via.collect() if r.value is not None]
    assert all(-1e-9 <= v <= 1.0 + 1e-9 for v in vals)
