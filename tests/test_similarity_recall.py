"""Approximate ANN variants: recall vs brute force + candidate volume."""

from __future__ import annotations

from prometheus_anomaly_detection_lstm_spark.io_tables import load_table
from prometheus_anomaly_detection_lstm_spark.operators.similarity import (
    cosine_topk,
    cosine_topk_ivf,
    cosine_topk_lsh,
)

SF = "/root/testdata/sf0.001"


def _topk_sets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r.q_id, set()).add(r.c_id)
    return out


def test_ivf_recall_vs_brute_force(spark):
    emb = load_table(spark, SF, "embeddings")
    exact = _topk_sets(cosine_topk(emb, n_queries=5, k=10))
    approx = _topk_sets(cosine_topk_ivf(emb, n_queries=5, k=10, n_lists=4, n_probe=2))
    recalls = [
        len(exact[q] & approx.get(q, set())) / len(exact[q]) for q in exact
    ]
    # probing half the lists must recover a substantial fraction
    assert sum(recalls) / len(recalls) >= 0.4, recalls


def test_lsh_candidates_are_true_neighbors_subset(spark):
    emb = load_table(spark, SF, "embeddings")
    approx = cosine_topk_lsh(emb, n_queries=5, k=10)
    # every reported neighbor must carry a genuine cosine (sanity) and
    # the rank sequence per query must be 1..n without gaps
    rows = approx.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.q_id, []).append(r.rk)
    for q, rks in by_q.items():
        assert sorted(rks) == list(range(1, len(rks) + 1)), (q, rks)


def test_multitable_lsh_recall_floor(spark):
    """OR-amplified multiprobe LSH must beat the single-table ~5%
    recall by an order of magnitude (measured ~0.5-0.6 here)."""
    emb = load_table(spark, SF, "embeddings")
    exact = _topk_sets(cosine_topk(emb, n_queries=5, k=10))
    approx = _topk_sets(cosine_topk_lsh(emb, n_queries=5, k=10))
    recalls = [
        len(exact[q] & approx.get(q, set())) / len(exact[q]) for q in exact
    ]
    assert sum(recalls) / len(recalls) >= 0.35, recalls


def test_lsh_recall08_config_floor(spark):
    """The named production config (similarity.LSH_RECALL08) must hold
    recall@10 >= 0.8 vs brute force — measured 0.88 at sf0.01, curve in
    BASELINE.md (tools/ann_recall_curve.py)."""
    from prometheus_anomaly_detection_lstm_spark.operators.similarity import (
        LSH_RECALL08,
    )

    emb = load_table(spark, SF, "embeddings")
    exact = _topk_sets(cosine_topk(emb, n_queries=5, k=10))
    approx = _topk_sets(
        cosine_topk_lsh(emb, n_queries=5, k=10, **LSH_RECALL08)
    )
    recalls = [
        len(exact[q] & approx.get(q, set())) / len(exact[q]) for q in exact
    ]
    assert sum(recalls) / len(recalls) >= 0.8, recalls


def test_ivf_recall08_config_floor(spark):
    """The named IVF config (similarity.IVF_RECALL08) must hold
    recall@10 >= 0.8 vs brute force — measured 0.90 at sf0.01."""
    from prometheus_anomaly_detection_lstm_spark.operators.similarity import (
        IVF_RECALL08,
    )

    emb = load_table(spark, SF, "embeddings")
    exact = _topk_sets(cosine_topk(emb, n_queries=5, k=10))
    approx = _topk_sets(
        cosine_topk_ivf(emb, n_queries=5, k=10, **IVF_RECALL08)
    )
    recalls = [
        len(exact[q] & approx.get(q, set())) / len(exact[q]) for q in exact
    ]
    assert sum(recalls) / len(recalls) >= 0.8, recalls
