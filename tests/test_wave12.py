"""Round-8 behavior pins: the frozen-BPE encode/apply pass against a
from-scratch Python leftmost-merge reference, packing composed on BPE
counts, exact-substring span removal on a planted duplicated corpus,
the DSPOT batch twin against the streaming fit, and empty-corpus
robustness for all four new queries."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from prometheus_anomaly_detection_lstm_spark.operators import bpe
from prometheus_anomaly_detection_lstm_spark.operators.text import (
    DUP_NGRAM_N,
    dup_span_removal,
)
from prometheus_anomaly_detection_lstm_spark.plans.wave11 import (
    DSPOT_DEPTH,
    dspot_threshold,
)
from prometheus_anomaly_detection_lstm_spark.registry import all_queries
from prometheus_anomaly_detection_lstm_spark.streaming.spot import (
    fit_spot_threshold,
)

DOC_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


def _py_bpe(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Independent leftmost non-overlapping BPE apply (rank order)."""
    t = list(word)
    for a, b in merges:
        out, i = [], 0
        while i < len(t):
            if i + 1 < len(t) and t[i] == a and t[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(t[i])
                i += 1
        t = out
    return t


def test_frozen_bpe_encode_matches_python_reference(spark):
    # includes the odd-run adversarial word (ararara) where greedy
    # leftmost differs from a naive string replace
    texts = [
        "the erstwhile miner was in the lower part of the part",
        "ararara starts interesting merger stories",
        "x " + "a" * 30,  # over-length word is filtered from the stream
    ]
    docs = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)], DOC_SCHEMA
    )
    got = {
        r.doc_id: (r.n_words, r.n_bpe_tokens, r.n_chars_tokenized)
        for r in bpe.encode_token_counts(docs, bpe.FROZEN_MERGES).collect()
    }
    for i, t in enumerate(texts):
        words = [
            w
            for w in t.lower().split()
            if 1 <= len(w) <= bpe.MAX_WORD_CHARS
        ]
        exp_tokens = sum(len(_py_bpe(w, bpe.FROZEN_MERGES)) for w in words)
        exp_chars = sum(len(w) for w in words)
        assert got[i] == (len(words), exp_tokens, exp_chars), i
    # the adversarial word alone: [ar, ar, ar, a]
    assert _py_bpe("ararara", bpe.FROZEN_MERGES) == ["ar", "ar", "ar", "a"]


def test_bpe_packing_composes_on_encode_counts(spark):
    docs = spark.createDataFrame(
        [
            (i, "merger parts are interesting to lower errors " * (i + 1),
             "en", "s", 10)
            for i in range(20)
        ],
        DOC_SCHEMA,
    )
    counts = {
        r.doc_id: r.n_bpe_tokens
        for r in bpe.encode_token_counts(docs, bpe.FROZEN_MERGES).collect()
    }
    packs = bpe.bpe_packing(docs).collect()
    # every doc lands in exactly one pack; token mass is conserved
    assert sum(r.n_docs for r in packs) == 20
    assert sum(r.total_tokens for r in packs) == sum(counts.values())
    # BPE compresses: fewer tokens than characters
    n_chars = sum(
        len(w) for i in range(20)
        for w in ("merger parts are interesting to lower errors " * (i + 1)).split()
    )
    assert sum(counts.values()) < n_chars


def test_dup_span_removal_on_planted_duplicates(spark):
    shared = " ".join(f"dup{i}" for i in range(DUP_NGRAM_N + 4))  # 12 words
    texts = {
        0: "alpha beta " + shared + " gamma",
        1: "start " + shared + " middle " + shared + " end",
        2: "totally unique words only here nothing shared at all",
    }
    docs = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts.values())],
        DOC_SCHEMA,
    )
    out = {r.doc_id: r for r in dup_span_removal(docs).collect()}
    assert len(out) == 3
    # doc 2 has no duplicated n-grams: untouched
    assert out[2].n_spans == 0 and out[2].n_words_removed == 0
    assert out[2].n_chars_removed == 0 and out[2].text_clean == texts[2]
    # doc 0: the 12 shared words collapse to ONE merged island
    assert out[0].n_spans == 1
    assert out[0].n_words_removed == DUP_NGRAM_N + 4
    assert out[0].text_clean == "alpha beta gamma"
    # doc 1 carries the span twice -> two islands, both removed
    assert out[1].n_spans == 2
    assert out[1].n_words_removed == 2 * (DUP_NGRAM_N + 4)
    assert out[1].text_clean == "start middle end"
    # char accounting is exact
    for i in texts:
        assert out[i].n_chars_removed == len(texts[i]) - len(
            out[i].text_clean
        )


def test_dspot_batch_twin_matches_streaming_fit(spark):
    rng = np.random.default_rng(7)
    n = 600
    # drifting baseline + heavy-tailed noise: plain SPOT would chase
    # the ramp; DSPOT fits residuals against the local mean
    vals = np.linspace(0.0, 50.0, n) + rng.gamma(2.0, 1.5, size=n)
    pdf = pd.DataFrame(
        {
            "metric": "m1",
            "ts": pd.date_range("2024-01-01", periods=n, freq="min"),
            "seq": np.arange(n),
            "value": vals,
        }
    )
    out = dspot_threshold(spark.createDataFrame(pdf)).collect()
    assert len(out) == 1
    r = out[0]
    # from-definition residuals: previous-DEPTH moving average
    ma = pd.Series(vals).rolling(DSPOT_DEPTH).mean().shift(1)
    resid = np.round(
        vals[DSPOT_DEPTH:] - np.round(ma.to_numpy()[DSPOT_DEPTH:], 9), 9
    )
    assert r.n == n - DSPOT_DEPTH and r.n_excess > 0
    z = fit_spot_threshold(resid)  # the streaming twin's exact math
    assert z is not None
    assert abs(r.dspot_threshold - z) < 1e-6
    # the residual-space threshold is small relative to the drift the
    # local model absorbed
    assert r.dspot_threshold < vals.max() / 2


def test_spot_calibrator_threshold_cache_is_invalidated_on_observe():
    from prometheus_anomaly_detection_lstm_spark.streaming.spot import (
        DriftSpotCalibrator,
        SpotCalibrator,
    )

    rng = np.random.default_rng(3)
    cal = SpotCalibrator(min_history=50)
    for v in rng.gamma(2.0, 10.0, size=200):
        cal.observe(float(v))
    t1 = cal.threshold
    assert t1 == cal.threshold  # cached read is stable
    assert t1 == fit_spot_threshold(
        np.asarray(cal._scores), cal.init_q, cal.risk
    )
    cal.observe(999.0)
    t2 = cal.threshold  # invalidated and refit on the new history
    assert t2 == fit_spot_threshold(
        np.asarray(cal._scores), cal.init_q, cal.risk
    )
    dcal = DriftSpotCalibrator(min_history=50, depth=8)
    for v in rng.gamma(2.0, 10.0, size=300):
        dcal.observe(float(v))
    d1 = dcal.threshold
    assert d1 == dcal.threshold
    dcal.observe(5.0)
    base = fit_spot_threshold(
        np.asarray(dcal._scores), dcal.init_q, dcal.risk
    )
    assert abs(dcal.threshold - (dcal._local_mean() + base)) < 1e-12


_SCHEMAS = {
    "events": (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    ),
    "documents": DOC_SCHEMA,
}


@pytest.fixture(scope="module")
def empty_sf(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("empty_sf12")
    for name, schema in _SCHEMAS.items():
        spark.createDataFrame([], schema).write.parquet(
            str(root / f"{name}.parquet")
        )
    return str(root)


@pytest.mark.parametrize(
    "name",
    [
        "metric_dspot_threshold",
        "metric_dspot_anomaly_hours",
        "corpus_dup_span_removal",
        "corpus_bpe_encode",
        "corpus_bpe_packing",
        "corpus_clean_tokenize_pack",
        "corpus_neardup_keep_best",
    ],
)
def test_round8_query_survives_empty_corpus(spark, empty_sf, name):
    fn, _ = all_queries()[name]
    rows = fn(spark, empty_sf).collect()
    assert rows == []


def test_neardup_keep_best_keeps_longest_member(spark):
    from prometheus_anomaly_detection_lstm_spark.operators.dedup import (
        neardup_keep_best,
    )

    docs = spark.createDataFrame(
        [
            (1, "a b c", "en", "s", 5),
            (2, "a b c d e f", "en", "s", 11),   # longest in cluster
            (3, "a b c d", "en", "s", 7),
            (9, "totally unrelated text here", "en", "s", 27),
        ],
        DOC_SCHEMA,
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3)], "doc_a long, doc_b long"
    )
    out = {r.doc_id: r for r in neardup_keep_best(docs, pairs).collect()}
    # cluster {1,2,3}: the LONGEST member survives, with cluster size
    assert set(out) == {2, 9}
    assert out[2].n_tokens == 6 and out[2].cluster_size == 3
    # unclustered docs pass through as singletons
    assert out[9].cluster_size == 1 and out[9].n_tokens == 4


def test_dup_span_removal_digest_keys_is_answer_identical(spark):
    shared = " ".join(f"dup{i}" for i in range(DUP_NGRAM_N + 4))
    docs = spark.createDataFrame(
        [
            (0, "alpha beta " + shared + " gamma", "en", "s", 1),
            (1, "start " + shared + " end", "en", "s", 1),
            (2, "totally unique words only here nothing shared", "en",
             "s", 1),
        ],
        DOC_SCHEMA,
    )
    text_keyed = sorted(
        map(tuple, dup_span_removal(docs).collect())
    )
    digest_keyed = sorted(
        map(tuple, dup_span_removal(docs, digest_keys=True).collect())
    )
    assert text_keyed == digest_keyed
