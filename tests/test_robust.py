"""Semantic pins for plans/robust.py beyond the DuckDB oracle parity:

- the CUSUM prefix-sum closed form equals the textbook recursion;
- Misra-Gries heavy hitters are EXACT (== plain group-by answer) and
  partitioning-invariant, at the guarantee-minimum counter budget;
- Theil-Sen pair volume is bounded by rows x max_lag and the slope
  equals the numpy median of the allowed pair slopes;
- entropy closed forms on constructed strings; Zipf slope sanity;
- funnel gaps are ordered and non-negative.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from prometheus_anomaly_detection_lstm_spark.plans import robust

from .conftest import SF_SMALL


def _series(spark):
    return robust._series(spark, SF_SMALL)


def test_cusum_closed_form_matches_recursion(spark):
    """S_t = C_t - min(0, running_min C_t) must equal the textbook
    max(0, S_{t-1} + z_t - K) recursion, exceedance for exceedance."""
    s = _series(spark)
    got = robust.cusum_anomalies(s).toPandas()
    raw = s.toPandas().sort_values(["metric", "ts", "seq"])
    want = []
    for metric, g in raw.groupby("metric"):
        mu, sd = g["value"].mean(), g["value"].std(ddof=0)
        if sd <= 0:
            continue
        z = (g["value"] - mu) / sd
        sp = sn = 0.0
        for (_, row), zt in zip(g.iterrows(), z):
            sp = max(0.0, sp + zt - robust.CUSUM_K)
            sn = max(0.0, sn - zt - robust.CUSUM_K)
            if sp > robust.CUSUM_H or sn > robust.CUSUM_H:
                want.append((metric, row["seq"], round(sp, 4), round(sn, 4)))
    got_set = {
        (r.metric, r.seq, round(r.cusum_pos, 4), round(r.cusum_neg, 4))
        for r in got.itertuples()
    }
    assert got_set == set(want)
    assert len(want) > 0  # the pin is non-vacuous on the test data


def test_heavy_hitters_exact_and_partitioning_invariant(spark):
    ev = robust.load_table(spark, SF_SMALL, "events")
    n = ev.count()
    want = (
        ev.groupBy("user_id")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= robust.HH_PHI * n)
    )
    want_set = {(r.user_id, r.cnt) for r in want.collect()}
    assert want_set  # non-vacuous
    # guarantee-minimum counter budget, hostile partitionings
    k_min = int(np.ceil(2 / robust.HH_PHI))
    for arranged in (ev, ev.repartition(13), ev.repartition(3, "event_type")):
        got = robust.heavy_hitters(arranged, k=k_min).collect()
        assert {(r.user_id, r.cnt) for r in got} == want_set


def test_mg_partial_survivor_guarantee():
    """Any item with stream count > n/(k+1) must survive the capped
    counter dict — checked on an adversarial order (heavy item's
    occurrences scattered across many batches of distractors)."""
    rng = np.random.default_rng(7)
    heavy = np.full(300, 42)
    noise = rng.integers(1000, 9000, size=2000)
    stream = np.concatenate([noise[:1000], heavy[:150], noise[1000:], heavy[150:]])
    batches = [
        pd.DataFrame({"user_id": stream[i : i + 100]})
        for i in range(0, len(stream), 100)
    ]
    k = 15  # n/(k+1) = 2300/16 ≈ 144 < 300
    out = list(robust._mg_partial(iter(batches), k))[0]
    assert 42 in set(out["user_id"])
    assert len(out) <= k + 100  # trimmed to ~k after each batch merge


def test_theil_sen_matches_numpy_and_bounds_pairs(spark):
    got = robust.theil_sen_trend(_series(spark)).toPandas()
    hourly = (
        _series(spark)
        .groupBy("metric", F.date_trunc("hour", "ts").alias("hour"))
        .agg(F.avg("value").alias("v"))
        .toPandas()
        .sort_values(["metric", "hour"])
    )
    for metric, g in hourly.groupby("metric"):
        eh = g["hour"].astype("int64").to_numpy() / 3.6e12
        v = g["v"].to_numpy()
        slopes = [
            (v[j] - v[i]) / (eh[j] - eh[i])
            for i in range(len(v))
            for j in range(i + 1, min(i + robust.TS_MAX_LAG, len(v) - 1) + 1)
        ]
        row = got[got.metric == metric].iloc[0]
        assert row.n_pairs == len(slopes)
        assert row.n_pairs <= len(v) * robust.TS_MAX_LAG
        assert row.theil_sen_slope == pytest.approx(
            np.median(slopes), abs=1e-6
        )


def test_char_entropy_closed_forms(spark):
    docs = spark.createDataFrame(
        [(1, "aaaa"), (2, "ab"), (3, "abcd")], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.char_entropy, r.distinct_chars, r.n_chars_total)
        for r in robust.char_entropy(docs).collect()
    }
    assert got[1] == (0.0, 1, 4)
    assert got[2] == (1.0, 2, 2)
    assert got[3] == (2.0, 4, 4)


def test_zipf_fit_is_negative_sloped(spark):
    row = robust.q_zipf_fit(spark, SF_SMALL).collect()[0]
    # sf0.001's synthetic vocab is smaller than ZIPF_RANKS — the limit
    # caps, never pads
    assert 1 <= row.n_ranks <= robust.ZIPF_RANKS
    assert row.zipf_slope < 0
    assert 0.0 <= row.r2 <= 1.0


def test_source_token_drift_properties(spark):
    """JSD is bounded [0, 1] (log2 base), zero for a shard whose token
    distribution IS the global one, and the absent-mass closed form
    matches an explicit full-outer computation."""
    docs = spark.createDataFrame(
        [
            (1, "a b c d", "s1"),
            (2, "a b c d", "s2"),
            (3, "x y", "s3"),
        ],
        "doc_id long, text string, source string",
    )
    got = {
        r.source: r.js_divergence
        for r in robust.source_token_drift(docs).collect()
    }
    # explicit reference: full outer over the union vocabulary
    import collections

    per = {
        "s1": collections.Counter("abcd"),
        "s2": collections.Counter("abcd"),
        "s3": collections.Counter("xy"),
    }
    glob = collections.Counter()
    for c in per.values():
        glob.update(c)
    ng = sum(glob.values())
    for src, cnt in per.items():
        ns = sum(cnt.values())
        jsd = 0.0
        for t, g in glob.items():
            ps, pg = cnt.get(t, 0) / ns, g / ng
            m = (ps + pg) / 2
            if ps > 0:
                jsd += 0.5 * ps * np.log2(ps / m)
            if pg > 0:
                jsd += 0.5 * pg * np.log2(pg / m)
        assert got[src] == pytest.approx(jsd, abs=1e-6), src
        assert 0.0 <= got[src] <= 1.0
    # s3 (disjoint vocab) must be the most drifted shard
    assert got["s3"] == max(got.values())


def test_funnel_timing_gaps_ordered(spark):
    rows = {r.step: r for r in robust.q_funnel_timing(spark, SF_SMALL).collect()}
    assert set(rows) == {"signup->click", "click->purchase", "signup->purchase"}
    n = {r.n_users for r in rows.values()}
    assert len(n) == 1  # same converter cohort for every step pair
    for r in rows.values():
        assert 0 <= r.p50_s <= r.p90_s
    # total = sum of the two legs, per converter => avg adds exactly
    assert rows["signup->purchase"].avg_s == pytest.approx(
        rows["signup->click"].avg_s + rows["click->purchase"].avg_s, abs=1e-5
    )


def test_heavy_hitters_null_user_ids_excluded(spark):
    """NULL actors never surface, and their events don't count toward
    the denominator — on either engine."""
    rows = [(None if i % 3 == 0 else i % 5, float(i)) for i in range(300)]
    ev = spark.createDataFrame(rows, "user_id long, value double")
    got = robust.heavy_hitters(ev, phi=0.1, k=50).collect()
    assert got and all(r.user_id is not None for r in got)
    n_valid = 200  # 100 of 300 rows are NULL
    for r in got:
        assert r.frac == pytest.approx(r.cnt / n_valid, abs=1e-6)


def test_nb_multiclass_confusion_separable_vocab(spark):
    """On a corpus with disjoint per-language vocabularies the
    multiclass NB must classify every held-out doc correctly (pure
    diagonal); row sums equal the held-out doc counts."""
    from prometheus_anomaly_detection_lstm_spark.operators.text import (
        nb_multiclass_confusion,
    )

    words = {"de": "der und das", "en": "the and of", "es": "el la que",
             "fr": "le les et", "zh": "zh1 zh2 zh3"}
    rows = []
    i = 0
    for lang, w in words.items():
        for _ in range(10):
            rows.append((i, f"{w} {w} {w}", lang))
            i += 1
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = nb_multiclass_confusion(docs).collect()
    assert all(r.true_lang == r.pred_lang for r in got)
    # doc_id % 5 == 0 is held out: 2 of the 10 docs per language
    assert {(r.true_lang, r.n) for r in got} == {
        (l, 2) for l in words
    }


def test_parts_abc_partition_invariants(spark):
    """Every brand has exactly one A class, cumulative-share classes
    are revenue-ordered (A share >= B per-part share >= C), and class
    revenues sum to the brand total."""
    from prometheus_anomaly_detection_lstm_spark.plans.relational import (
        q_parts_abc_by_brand,
    )

    rows = q_parts_abc_by_brand(spark, SF_SMALL).toPandas()
    assert (rows.groupby("p_brand").abc.apply(lambda s: "A" in set(s))).all()
    per_part = rows.assign(rpp=rows.class_revenue / rows.n_parts)
    for brand, g in per_part.groupby("p_brand"):
        by_class = g.set_index("abc").rpp
        if "A" in by_class and "C" in by_class:
            assert by_class["A"] > by_class["C"]


def test_abc_crossing_part_is_class_a(spark):
    """The threshold-crossing part belongs to A: a brand whose top part
    alone covers 95% of revenue still has an A part (review finding)."""
    from prometheus_anomaly_detection_lstm_spark.plans.relational import (
        q_parts_abc_by_brand,
    )
    import tempfile, os

    root = tempfile.mkdtemp()
    li = spark.createDataFrame(
        [(1, 101, 1, 1, 1.0, 9500.0, 0.0, 0.0, "N", "O", None),
         (2, 102, 1, 1, 1.0, 300.0, 0.0, 0.0, "N", "O", None),
         (3, 103, 1, 1, 1.0, 200.0, 0.0, 0.0, "N", "O", None)],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    )
    part = spark.createDataFrame(
        [(101, "a", "m", "B1", "t", 1, "c", 1.0, ""),
         (102, "b", "m", "B1", "t", 1, "c", 1.0, ""),
         (103, "c", "m", "B1", "t", 1, "c", 1.0, "")],
        "p_partkey long, p_name string, p_mfgr string, p_brand string, "
        "p_type string, p_size int, p_container string, "
        "p_retailprice double, p_comment string",
    )
    li.write.parquet(os.path.join(root, "lineitem.parquet"))
    part.write.parquet(os.path.join(root, "part.parquet"))
    rows = {r.abc: r for r in q_parts_abc_by_brand(spark, root).collect()}
    assert rows["A"].n_parts == 1            # the 95% part IS class A
    assert rows["A"].class_revenue == 9500.0


def test_markov_eval_beats_or_meets_chance(spark):
    from prometheus_anomaly_detection_lstm_spark.plans.robust import (
        q_markov_next_event_eval,
    )

    rows = q_markov_next_event_eval(spark, SF_SMALL).collect()
    assert len(rows) == 5  # one state per event type
    for r in rows:
        assert 0.0 <= r.accuracy <= 1.0
        assert r.n_held > 0 and r.pred_type is not None


def test_readability_closed_forms(spark):
    from prometheus_anomaly_detection_lstm_spark.plans.robust import (
        readability_scores,
    )

    docs = spark.createDataFrame(
        [(1, "The cat sat. The dog ran!"), (2, ""), (3, "Extraordinary")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in readability_scores(docs).collect()}
    assert got[1].n_sentences == 2 and got[1].n_words == 6
    assert got[1].words_per_sentence == 3.0
    # empty doc: 0 words -> NULL ratios (ANSI-safe), sentence floor 1
    assert got[2].n_words == 0 and got[2].syllables_per_word is None
    assert got[2].flesch_score is None
    # 'extraordinary' -> vowel groups e,ao,i,a + y = 5
    assert got[3].n_syllables == 5


def test_wilson_interval_properties(spark):
    """The interval brackets the point estimate, lies in [0, 1], and
    matches the closed form computed in plain Python."""
    from prometheus_anomaly_detection_lstm_spark.plans.robust import (
        q_return_rate_by_brand,
    )
    import math

    rows = q_return_rate_by_brand(spark, SF_SMALL).collect()
    assert rows
    z = 1.959964
    for row in rows:
        n, r = row.n_lineitems, row.n_returned
        p = r / n
        denom = 1 + z * z / n
        center = (p + z * z / (2 * n)) / denom
        half = z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n)) / denom
        assert row.wilson_lo == pytest.approx(center - half, abs=1e-6)
        assert row.wilson_hi == pytest.approx(center + half, abs=1e-6)
        assert 0.0 <= row.wilson_lo <= row.return_rate <= row.wilson_hi <= 1.0


def test_hhi_bounds_and_ttr_closed_forms(spark):
    from prometheus_anomaly_detection_lstm_spark.plans.robust import (
        q_doc_type_token_ratio,
        q_supplier_hhi_by_nation,
    )

    for r in q_supplier_hhi_by_nation(spark, SF_SMALL).collect():
        # HHI in (10000/n, 10000]; top share consistent with HHI
        assert 10000 / r.n_suppliers - 1e-6 <= r.hhi <= 10000 + 1e-6
        assert r.hhi >= 10000 * r.top_share**2 - 1e-3
    got = {
        r.doc_id: r
        for r in q_doc_type_token_ratio(spark, SF_SMALL).collect()
    }
    for r in got.values():
        assert r.n_types <= r.n_tokens
        if r.ttr is not None:
            assert 0 < r.ttr <= 1.0
        if r.hapax_share is not None:
            assert 0 <= r.hapax_share <= 1.0
