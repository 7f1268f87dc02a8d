"""Round-7 wave 11 behavior pins: char-trigram NB lang-id on a planted
multilingual fixture, perplexity-bucket filtering on planted garbage,
a from-definition numpy replica of the SPOT/GPD fit, and empty-corpus
robustness for all three queries."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from prometheus_anomaly_detection_lstm_spark.plans.wave11 import (
    LANGID_FOLD_MOD,
    SPOT_INIT_Q,
    SPOT_RISK,
    lang_id_ngram,
    perplexity_filter,
    spot_threshold,
)
from prometheus_anomaly_detection_lstm_spark.registry import all_queries

DOC_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)

#: orthographically distinctive per-language seed phrases — trigram
#: tables trained on these separate cleanly.
_LANG_PHRASES = {
    "de": "der die das und ist nicht ein eine mit von zu auf für wird sich",
    "en": "the and is of to in that it was for with as on at by this have",
    "es": "el la los las de que y en un una es por con para su al lo como",
    "fr": "le la les de et un une est que pour dans qui au du avec sur ne",
    "zh": "de shi zai le wo ni ta men zhe na you mei hen dou hui neng yao",
}


def _planted_docs(spark, reps=6):
    rows = []
    doc_id = 0
    for rep in range(reps):
        for lang, phrase in sorted(_LANG_PHRASES.items()):
            # vary word order per rep so train/test folds differ
            words = phrase.split()
            rot = words[rep % len(words):] + words[: rep % len(words)]
            text = " ".join(rot * 3)
            rows.append((doc_id, text, lang, f"src{rep}", len(text)))
            doc_id += 1
    return spark.createDataFrame(rows, DOC_SCHEMA)


def test_lang_id_ngram_recovers_planted_languages(spark):
    docs = _planted_docs(spark)
    out = lang_id_ngram(docs).collect()
    held_out = docs.filter(f"doc_id % {LANGID_FOLD_MOD} = 0").count()
    assert len(out) == held_out > 0
    # distinctive orthography -> perfect held-out identification
    assert all(r.correct == 1 for r in out), [
        (r.doc_id, r.lang_true, r.lang_pred) for r in out if not r.correct
    ]
    # scores are finite, non-positive log-likelihood means
    for r in out:
        for lang in _LANG_PHRASES:
            assert r[f"s_{lang}"] < 0


def test_perplexity_filter_sends_garbage_to_tail(spark):
    common = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, common, "en", "src0", len(common)) for i in range(12)]
    # garbage doc: trigrams that appear nowhere else -> rare -> high ppl
    rows.append((12, "zzqxj vvkwp qqzzt xxjjy wwqqv kkzzx", "en", "src0", 35))
    docs = spark.createDataFrame(rows, DOC_SCHEMA)
    out = {r.doc_id: r for r in perplexity_filter(docs).collect()}
    assert len(out) == 13
    garbage = out[12]
    assert garbage.bucket == "tail" and garbage.keep == 0
    # the identical common docs share one perplexity and stay kept
    assert all(out[i].keep == 1 for i in range(12))
    assert all(out[i].ppl < garbage.ppl for i in range(12))


def test_spot_threshold_matches_numpy_definition(spark):
    rng = np.random.default_rng(42)
    vals = rng.gamma(2.0, 10.0, size=400)  # heavy-ish right tail
    pdf = pd.DataFrame(
        {
            "metric": "m1",
            "ts": pd.date_range("2024-01-01", periods=400, freq="min"),
            "seq": np.arange(400),
            "value": vals,
        }
    )
    out = spot_threshold(spark.createDataFrame(pdf)).collect()
    assert len(out) == 1
    r = out[0]
    # from-definition replica (Siffer et al. KDD'17, MoM GPD fit)
    t0 = np.percentile(vals, SPOT_INIT_Q * 100)  # linear interpolation
    y = vals[vals > t0] - t0
    m, s2 = y.mean(), y.var()
    xi = (1 - m * m / s2) / 2
    sigma = m * (1 + m * m / s2) / 2
    arg = SPOT_RISK * len(vals) / len(y)
    z = t0 + (sigma / xi) * (arg ** (-xi) - 1)
    assert r.n == 400 and r.n_excess == len(y)
    assert abs(r.t0 - round(t0, 6)) < 1e-9
    assert abs(r.gpd_xi - xi) < 1e-6
    assert abs(r.gpd_sigma - sigma) < 1e-6
    assert abs(r.spot_threshold - z) < 1e-6
    # the q-risk threshold sits beyond the initial quantile and the
    # empirical exceedance rate is at most a few q
    assert r.spot_threshold > r.t0
    assert r.n_over <= max(3, 3 * SPOT_RISK * r.n)


def test_spot_threshold_degenerate_tail_emits_nulls(spark):
    # constant excesses -> zero variance -> honest NULL fit
    pdf = pd.DataFrame(
        {
            "metric": "flat",
            "ts": pd.date_range("2024-01-01", periods=100, freq="min"),
            "seq": np.arange(100),
            "value": [1.0] * 98 + [5.0, 5.0],
        }
    )
    r = spot_threshold(spark.createDataFrame(pdf)).collect()[0]
    assert r.gpd_xi is None and r.spot_threshold is None
    assert r.n_over == 0


_SCHEMAS = {
    "events": (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    ),
    "documents": DOC_SCHEMA,
}


@pytest.fixture(scope="module")
def empty_sf(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("empty_sf11")
    for name, schema in _SCHEMAS.items():
        spark.createDataFrame([], schema).write.parquet(
            str(root / f"{name}.parquet")
        )
    return str(root)


@pytest.mark.parametrize(
    "name",
    [
        "text_lang_id_ngram",
        "corpus_perplexity_filter",
        "metric_spot_threshold",
        "corpus_ccnet_partition",
        "metric_spot_anomaly_hours",
        "text_lang_id_confusion",
    ],
)
def test_round7_query_survives_empty_corpus(spark, empty_sf, name):
    fn, _ = all_queries()[name]
    rows = fn(spark, empty_sf).collect()
    assert rows == []
