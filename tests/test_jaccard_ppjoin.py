"""PPJoin positional/length filters on ngram_jaccard_pairs (round 13).

Adversarial constructions for the r13 candidate-pruning filters:
the shared shingles are made globally FREQUENT (planted in filler
docs) so they rank LAST in every doc under the rarest-first order —
the pair's first common shingle then sits at the very end of both
prefixes, which minimizes the positional remaining-count
1 + min(|A|-rn_a, |B|-rn_b) and exercises the bound exactly at the
threshold boundary.  At t=0.2 with |A|=|B|=9 and |A∩B|=3 the float
product t/(1+t)*(na+nb) = 3.0000000000000004, so an unguarded ceil
would demand 4 shared shingles and silently drop a TRUE pair
(J = 3/15 = 0.2 >= t) — this pins the -1e-9 guard.
"""

from __future__ import annotations

import pytest

from prometheus_anomaly_detection_lstm_spark.operators.dedup import (
    SHINGLE_N,
    ngram_jaccard_pairs,
)


def _mk_docs(spark):
    shared = "s1 s2 s3 s4 s5"  # 3 shared trigrams: s123, s234, s345
    rows = [
        (0, "a1 a2 a3 a4 a5 a6 " + shared),  # 9 trigrams, 3 shared
        (1, "b1 b2 b3 b4 b5 b6 " + shared),  # 9 trigrams, 3 shared
        # fillers plant the shared block in 3 more docs so its
        # trigrams are the most frequent -> ranked LAST per doc
        (2, "c1 c2 c3 c4 c5 c6 " + shared),
        (3, "d1 d2 d3 d4 d5 d6 " + shared),
        (4, "e1 e2 e3 e4 e5 e6 " + shared),
        # a no-overlap doc: must never pair with anything
        (5, "z1 z2 z3 z4 z5 z6 z7 z8"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _brute(rows, threshold, n=SHINGLE_N):
    sets = {}
    for doc_id, text in rows:
        words = text.split(" ")
        sets[doc_id] = {
            " ".join(words[i : i + n]) for i in range(len(words) - n + 1)
        }
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
    return want


def test_boundary_pair_survives_positional_filter(spark):
    docs = _mk_docs(spark)
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in ngram_jaccard_pairs(docs, threshold=0.2).collect()
    }
    want = _brute([(r.doc_id, r.text) for r in docs.collect()], 0.2)
    # the construction actually hits the boundary: every doc pair 0..4
    # shares exactly the 3 planted trigrams at J = 3/15 = t
    assert (0, 1) in want and want[(0, 1)] == 0.2
    assert got == pytest.approx(want)


@pytest.mark.parametrize("threshold", [0.12, 0.5])
def test_late_ranked_overlap_equals_brute_force(spark, threshold):
    docs = _mk_docs(spark)
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in ngram_jaccard_pairs(docs, threshold=threshold).collect()
    }
    want = _brute([(r.doc_id, r.text) for r in docs.collect()], threshold)
    if threshold == 0.5:
        assert want == {}  # length+positional filters prune everything
    assert got == pytest.approx(want)
