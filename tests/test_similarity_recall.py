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


def test_near_dup_candidate_volume_bounded_under_outliers(spark):
    """Planted far-outliers must not inflate the cell-join candidate
    volume: the quantile radius keeps probe sets tight while the exact
    spill set keeps the answer identical to brute force."""
    import numpy as np
    from pyspark.sql import functions as F

    from prometheus_anomaly_detection_lstm_spark.operators.similarity import (
        _near_dup_candidates,
        embedding_near_dup_pairs,
        with_norm,
    )

    # clustered corpus (8 tight clusters on the sphere, 40 points each)
    # — the regime where cell pruning actually prunes; the raw testdata
    # embeddings are near-uniform on the sphere, so at threshold 0.5
    # every pair is a candidate regardless of radius policy
    rng = np.random.default_rng(7)
    dim, k_clusters, per = 16, 8, 40
    centers = rng.standard_normal((k_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    pts = [
        centers[ci] + rng.normal(0, 0.15, dim)
        for ci in range(k_clusters)
        for _ in range(per)
    ]
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(pts)]
    # plant 5 far outliers in random directions
    outs = rng.standard_normal((5, dim)) * 10
    rows += [(10_000 + i, [float(x) for x in v]) for i, v in enumerate(outs)]
    poisoned = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>"
    )

    threshold = 0.9
    n_max = _near_dup_candidates(
        poisoned, threshold=threshold, n_cells=8, radius_quantile=1.0
    ).count()
    n_q = _near_dup_candidates(
        poisoned, threshold=threshold, n_cells=8, radius_quantile=0.9
    ).count()
    # quantile radius must cut candidate volume vs the max radius under
    # poisoning (measured: 20271 vs 40865 — the outliers inflate their
    # home cells' radii, dragging broad probe sets in)
    assert n_q < n_max * 0.7, (n_q, n_max)

    # and the ANSWER is still exact: compare against brute force
    normed = with_norm(poisoned)
    a = normed.select(
        F.col("vec_id").alias("id_a"), F.col("vec").alias("va"), F.col("norm").alias("na")
    )
    b = normed.select(
        F.col("vec_id").alias("id_b"), F.col("vec").alias("vb"), F.col("norm").alias("nb")
    )
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    brute = (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", dot / (F.col("na") * F.col("nb")))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))
    )
    got = sorted(
        map(tuple, embedding_near_dup_pairs(poisoned, threshold=threshold).collect())
    )
    want = sorted(map(tuple, brute.collect()))
    assert got == want and len(want) > 0


def test_ivf_prebuilt_index_matches_inline(spark, tmp_path):
    """build_ivf_index -> cosine_topk_ivf_prebuilt returns exactly the
    inline cosine_topk_ivf answer, and the on-disk layout is one
    partition directory per coarse list."""
    import os

    from prometheus_anomaly_detection_lstm_spark.operators.similarity import (
        build_ivf_index,
        cosine_topk_ivf_prebuilt,
    )

    emb = load_table(spark, SF, "embeddings")
    path = str(tmp_path / "ivf")
    build_ivf_index(emb, path, n_lists=4)
    pre = sorted(
        map(tuple, cosine_topk_ivf_prebuilt(spark, path, n_queries=5, k=10, n_probe=2).collect())
    )
    inline = sorted(
        map(tuple, cosine_topk_ivf(emb, n_queries=5, k=10, n_lists=4, n_probe=2).collect())
    )
    assert pre == inline and len(pre) > 0
    part_dirs = [
        d for d in os.listdir(os.path.join(path, "assignments"))
        if d.startswith("centroid_id=")
    ]
    assert 1 < len(part_dirs) <= 4


def test_lsh_prebuilt_index_matches_inline(spark, tmp_path):
    """build_lsh_index -> cosine_topk_lsh_prebuilt returns exactly the
    inline cosine_topk_lsh answer at the registry config, and the
    posting layout is one directory per table (partition pruning)."""
    import os

    from prometheus_anomaly_detection_lstm_spark.operators.similarity import (
        build_lsh_index,
        cosine_topk_lsh,
        cosine_topk_lsh_prebuilt,
    )

    emb = load_table(spark, SF, "embeddings")
    path = str(tmp_path / "lsh")
    build_lsh_index(emb, path, planes=8, tables=16)
    pre = sorted(
        map(
            tuple,
            cosine_topk_lsh_prebuilt(
                spark, path, n_queries=5, k=10, probe_hamming=2
            ).collect(),
        )
    )
    inline = sorted(
        map(
            tuple,
            cosine_topk_lsh(
                emb, n_queries=5, k=10, planes=8, tables=16, probe_hamming=2
            ).collect(),
        )
    )
    assert pre == inline and len(pre) > 0
    table_dirs = [
        d for d in os.listdir(os.path.join(path, "buckets"))
        if d.startswith("table=")
    ]
    assert len(table_dirs) == 16


def test_pq_prebuilt_index_matches_inline(spark, tmp_path):
    """build_pq_index -> pq_topk_prebuilt returns exactly the inline
    pq_topk answer at the registry search config (round-9 verdict task
    3: the persisted-codebooks deployment shape), and the index carries
    the two layers (tiny codebooks + corpus codes)."""
    import os

    from prometheus_anomaly_detection_lstm_spark.operators.kmeans import (
        _vec,
        build_pq_index,
        pq_topk,
        pq_topk_prebuilt,
    )

    vec = _vec(spark, SF)
    path = str(tmp_path / "pq")
    build_pq_index(vec, path)
    pre = sorted(map(tuple, pq_topk_prebuilt(spark, path).collect()))
    inline = sorted(map(tuple, pq_topk(vec).collect()))
    assert pre == inline and len(pre) > 0
    assert os.path.isdir(os.path.join(path, "codebooks"))
    assert os.path.isdir(os.path.join(path, "codes"))
