"""BPE merge learning vs a from-scratch Python reference.

The Python twin below implements textbook BPE (Sennrich 2016) directly
on a word-frequency dict — written independently of the Spark operator
so a shared mistake can't stay green."""

from __future__ import annotations

import re
from collections import Counter

from prometheus_anomaly_detection_lstm_spark.operators import bpe

from .conftest import SF_SMALL


def _py_bpe(texts, n_merges, max_word=bpe.MAX_WORD_CHARS):
    words = Counter()
    for t in texts:
        for w in re.split(r"\s+", t.lower()):
            if 0 < len(w) <= max_word:
                words[w] += 1
    vocab = {tuple(w): c for w, c in words.items()}
    merges = []
    for rank in range(1, n_merges + 1):
        pairs = Counter()
        for toks, c in vocab.items():
            for i in range(len(toks) - 1):
                pairs[(toks[i], toks[i + 1])] += c
        if not pairs:
            break
        # count desc, pair lexical asc — the operator's tiebreak
        (a, b), n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, a, b, a + b, n))
        new_vocab = {}
        for toks, c in vocab.items():
            out = []
            for x in toks:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def test_learned_merges_match_python_reference_on_toy_corpus(spark):
    texts = [
        "low low low low low",
        "lower lower newest newest newest",
        "newest newest newest widest widest",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = [
        (r["rank"], r["left"], r["right"], r["merged"], r["pair_count"])
        for r in bpe.learn_bpe_merges(spark, docs, n_merges=6)
        .orderBy("rank")
        .collect()
    ]
    assert got == _py_bpe(texts, 6)


def test_learned_merges_match_python_reference_on_real_docs(spark):
    import duckdb

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    texts = [
        r[0]
        for r in duckdb.sql(
            f"SELECT text FROM '{SF_SMALL}/documents.parquet'"
        ).fetchall()
    ]
    got = [
        (r["rank"], r["left"], r["right"], r["merged"], r["pair_count"])
        for r in bpe.learn_bpe_merges(spark, docs, n_merges=bpe.N_MERGES)
        .orderBy("rank")
        .collect()
    ]
    assert got == _py_bpe(texts, bpe.N_MERGES)


def test_encode_shrinks_token_count_and_preserves_chars(spark):
    texts = ["aaaa aaaa", "aa aa aa"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges = [
        (r["left"], r["right"])
        for r in bpe.learn_bpe_merges(spark, docs, n_merges=2)
        .orderBy("rank")
        .collect()
    ]
    out = {
        r["doc_id"]: (r["n_bpe_tokens"], r["n_chars_tokenized"])
        for r in bpe.encode_token_counts(docs, merges).collect()
    }
    # merge1: a+a -> aa; merge2: aa+aa -> aaaa
    assert out[0] == (2, 8)   # two words "aaaa" -> one token each
    assert out[1] == (3, 6)   # three words "aa" -> one token each
    # with no merges, token count equals char count
    raw = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in bpe.encode_token_counts(docs, []).collect()
    }
    assert raw[0] == 8 and raw[1] == 6


def test_learned_merges_match_python_reference_fuzz(spark):
    """Hypothesis fuzz: random tiny corpora over a 3-letter alphabet —
    adversarial for merge ties and overlap (aaa/abab cases) — must
    match the independent Python BPE exactly, including tiebreaks."""
    from hypothesis import given, settings, strategies as st

    words = st.lists(
        st.text(alphabet="abc", min_size=1, max_size=6),
        min_size=1,
        max_size=12,
    )

    @settings(max_examples=5, deadline=None)
    @given(ws=words)
    def run(ws):
        texts = [" ".join(ws)]
        docs = spark.createDataFrame(
            [(0, texts[0])], "doc_id long, text string"
        )
        got = [
            (r["rank"], r["left"], r["right"], r["merged"], r["pair_count"])
            for r in bpe.learn_bpe_merges(spark, docs, n_merges=3)
            .orderBy("rank")
            .collect()
        ]
        assert got == _py_bpe(texts, 3)

    run()
