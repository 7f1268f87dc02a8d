"""Bounded-plan BPE encode (r8 verdict task 3): the Arrow kernel must
be bit-equal to the Catalyst fold chain — same tokens, same order —
on the frozen production merges AND on adversarial merge lists,
because the kernel's min-rank/monotone-floor algorithm claims exact
fold-chain semantics (one complete leftmost pass per rank, skipped
ranks provably identity)."""

from __future__ import annotations

from prometheus_anomaly_detection_lstm_spark.operators import bpe

from .conftest import SF_SMALL


def _py_fold_chain(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Reference: the fold chain's semantics verbatim — every merge, in
    rank order, one leftmost non-overlapping pass each."""
    toks = list(word)
    for left, right in merges:
        out: list[str] = []
        for x in toks:
            if out and out[-1] == left and x == right:
                out[-1] = left + right
            else:
                out.append(x)
        toks = out
    return toks


def _kernel_encode(word: str, merges: list[tuple[str, str]]) -> list[str]:
    import pandas as pd

    k = bpe.make_bpe_encode_kernel(merges)
    [out] = list(k(iter([pd.DataFrame({"word": [word]})])))
    return list(out["t"].iloc[0])


ADVERSARIAL = [
    # odd/even same-char runs (the classic leftmost trap)
    ("aaa", [("a", "a")]),
    ("aaaa", [("a", "a")]),
    ("aaaaa", [("a", "a"), ("aa", "a")]),
    ("ararara", [("a", "r"), ("ar", "ar")]),
    # a LATER merge creates an EARLIER merge's pair: the fold chain
    # does NOT revisit rank 1, and neither may the kernel
    ("abc", [("ab", "c"), ("a", "b")]),
    # merged token becomes the left side of the SAME rank later in
    # the word under a different neighbor
    ("abab", [("a", "b"), ("ab", "ab")]),
    ("xyxyxy", [("x", "y"), ("xy", "xy")]),
    # rank skipping: middle merge absent entirely
    ("stone", [("s", "t"), ("q", "q"), ("st", "o")]),
]


def test_kernel_matches_fold_semantics_on_adversarial_words():
    for word, merges in ADVERSARIAL:
        assert _kernel_encode(word, merges) == _py_fold_chain(word, merges), (
            word,
            merges,
        )


def test_kernel_matches_fold_chain_on_frozen_merges(spark):
    """Full-frame equality on the real corpus vocabulary: fold chain
    vs Arrow kernel, word by word, token by token."""
    from prometheus_anomaly_detection_lstm_spark.io_tables import load_table

    docs = load_table(spark, SF_SMALL, "documents")
    vocab = bpe._word_stream(docs).select("word").distinct()
    a = {
        r["word"]: list(r["t"])
        for r in bpe.encode_word_tokens(vocab, bpe.FROZEN_MERGES).collect()
    }
    b = {
        r["word"]: list(r["t"])
        for r in bpe.encode_word_tokens_bounded(
            vocab, bpe.FROZEN_MERGES
        ).collect()
    }
    assert a == b and len(a) >= 25


def test_kernel_fuzz_vs_fold_reference():
    """Random words over a tiny alphabet x random (topologically valid
    AND invalid) merge lists: kernel == fold-chain reference always."""
    import random

    rng = random.Random(9)
    alphabet = "abc"
    for _ in range(300):
        word = "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 14)))
        symbols = list(alphabet)
        merges = []
        for _ in range(rng.randint(1, 8)):
            l, r = rng.choice(symbols), rng.choice(symbols)
            merges.append((l, r))
            if len(l + r) <= 6:
                symbols.append(l + r)
        assert _kernel_encode(word, merges) == _py_fold_chain(word, merges), (
            word,
            merges,
        )


def test_bounded_token_counts_match_fold_path(spark):
    """End-to-end: encode_token_counts(bounded=True) == fold path on
    the real corpus (the PYTEST_ONLY parity entry covers the DuckDB
    side; this pins Spark-vs-Spark)."""
    from prometheus_anomaly_detection_lstm_spark.io_tables import load_table

    docs = load_table(spark, SF_SMALL, "documents")
    a = sorted(
        map(tuple, bpe.encode_token_counts(docs, bpe.FROZEN_MERGES).collect())
    )
    b = sorted(
        map(
            tuple,
            bpe.encode_token_counts(
                docs, bpe.FROZEN_MERGES, bounded=True
            ).collect(),
        )
    )
    assert a == b and len(a) > 0


def test_pad_merges_provably_never_fire():
    """corpus_bpe_encode_32k's oracle claim: the 31,990 pad entries of
    merges_32k() can never fire on ANY word — even one that contains
    the pad marker characters themselves — because every pad LEFT token
    is multi-character and no merge in the table outputs a pad left
    token, so no token stream can ever contain one.  Pin the proof on
    adversarial words built from the pad alphabet."""
    merges = bpe.merges_32k()
    frozen = list(bpe.FROZEN_MERGES)
    adversarial = [
        "①0②0",          # the raw pad pair glyphs, adjacent
        "①②",            # bare markers
        "x①1②1x",        # embedded mid-word
        "er①0",          # frozen-merge output followed by marker
        "①" * 5 + "②" * 5,
        "mer①12②12lu",    # frozen merges fire around the markers
    ]
    for word in adversarial:
        assert _kernel_encode(word, merges) == _py_fold_chain(
            word, frozen
        ), word
    # and on a real-alphabet word the 32k table equals the frozen-10
    assert _kernel_encode("lowermaster", merges) == _py_fold_chain(
        "lowermaster", frozen
    )
