"""Exactness guarantees of the scale-safe candidate schemes.

Each rewritten near-dup operator claims ANSWER-IDENTICAL results to the
naive all-pairs formulation (pigeonhole banding, AllPairs prefix
filtering, triangle-inequality cell pruning are candidate REDUCTIONS,
not approximations).  These tests pin that claim against independent
pure-Python/NumPy brute force on adversarial random data with planted
near-duplicates.
"""

from __future__ import annotations

import random

import numpy as np
import pytest

from prometheus_anomaly_detection_lstm_spark.operators.dedup import (
    SHINGLE_N,
    ngram_jaccard_pairs,
    simhash16,
    simhash_near_pairs,
)
from prometheus_anomaly_detection_lstm_spark.operators.similarity import (
    embedding_near_dup_pairs,
)


def _random_docs(spark, n=36, seed=11):
    """Random word docs with planted near-duplicate pairs."""
    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(40)]  # small vocab -> shared shingles
    docs = []
    for i in range(n):
        words = [rng.choice(vocab) for _ in range(rng.randint(8, 30))]
        docs.append((i, " ".join(words)))
    # planted near-dups: copy with a small mutation
    for i in range(0, n, 7):
        base = docs[i][1].split()
        j = rng.randrange(len(base))
        base[j] = rng.choice(vocab)
        docs.append((n + i, " ".join(base)))
    return spark.createDataFrame(docs, ["doc_id", "text"])


def _shingle_sets(rows, n=SHINGLE_N):
    out = {}
    for doc_id, text in rows:
        words = text.split(" ")
        if len(words) < n:
            continue
        out[doc_id] = {
            " ".join(words[i : i + n]) for i in range(len(words) - n + 1)
        }
    return out


# 0.12/0.2 hit integral t*n products for many doc sizes (e.g.
# 0.12*25 = 3.0000000000000004 in floats) — the ceil-epsilon boundary
# fixed per ADVICE r2.
@pytest.mark.parametrize("threshold", [0.12, 0.2])
def test_prefix_filtered_jaccard_equals_brute_force(spark, threshold):
    docs = _random_docs(spark)
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in ngram_jaccard_pairs(docs, threshold).collect()
    }
    sets = _shingle_sets([(r.doc_id, r.text) for r in docs.collect()])
    ids = sorted(sets)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sets[a] & sets[b])
            if inter == 0:
                continue
            j = inter / (len(sets[a]) + len(sets[b]) - inter)
            if j >= threshold:
                want[(a, b)] = round(j, 6)
    assert got == pytest.approx(want)


def test_banded_simhash_equals_brute_force(spark):
    docs = _random_docs(spark, n=30, seed=23)
    fps = {r.doc_id: r.simhash for r in simhash16(docs).collect()}
    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in simhash_near_pairs(docs, max_hamming=3).collect()
    }
    ids = sorted(fps)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            h = bin(fps[a] ^ fps[b]).count("1")
            if h <= 3:
                want[(a, b)] = h
    assert got == want


@pytest.mark.parametrize("n_cells", [4, 8])
def test_cell_join_embedding_dedup_equals_brute_force(spark, n_cells):
    rng = np.random.default_rng(5)
    n, dim = 80, 16
    vecs = rng.standard_normal((n, dim))
    # planted near-dup pairs: small perturbations of earlier vectors
    for i in range(0, 20, 4):
        vecs[n - 1 - i] = vecs[i] + rng.standard_normal(dim) * 0.15
    emb = spark.createDataFrame(
        [(int(i), [float(x) for x in vecs[i]], 0) for i in range(n)],
        ["vec_id", "embedding", "label"],
    )
    threshold = 0.5
    got = {
        (r.id_a, r.id_b): r.cosine
        for r in embedding_near_dup_pairs(
            emb, threshold=threshold, n_cells=n_cells
        ).collect()
    }
    norms = np.linalg.norm(vecs, axis=1)
    cos = (vecs @ vecs.T) / np.outer(norms, norms)
    want = {
        (i, j): round(float(cos[i, j]), 6)
        for i in range(n)
        for j in range(i + 1, n)
        if cos[i, j] >= threshold
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-6)
