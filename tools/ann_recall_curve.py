"""Measure the recall/candidate-volume curve for the approximate ANN paths.

Sweeps multi-table multiprobe sign-LSH (tables x probe_hamming) and IVF
(n_lists x n_probe) against the brute-force cosine top-k ground truth,
printing one markdown table per family.  Recall@k = |approx ∩ exact| /
k averaged over queries; candidate volume = distinct (q, c) pairs that
reach the exact-cosine ranking stage, as a fraction of the brute-force
pair count (n_queries * (n_vecs - 1)).

Run: python tools/ann_recall_curve.py [sf_dir]   (default sf0.01)
The measured numbers are recorded in BASELINE.md; the production
config with recall@10 >= 0.8 is named similarity.LSH_RECALL08 and its
floor is pinned in tests/test_similarity_recall.py.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from prometheus_anomaly_detection_lstm_spark.io_tables import load_table
from prometheus_anomaly_detection_lstm_spark.operators import similarity as S
from prometheus_anomaly_detection_lstm_spark.session import get_spark

N_QUERIES = 10
K = 10


def topk_sets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r.q_id, set()).add(r.c_id)
    return out


def recall(exact, approx):
    return sum(
        len(exact[q] & approx.get(q, set())) / len(exact[q]) for q in exact
    ) / len(exact)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("ann-recall")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_table(spark, sf_dir, "embeddings")
    n_vecs = emb.count()
    brute_pairs = N_QUERIES * (n_vecs - 1)
    exact = topk_sets(S.cosine_topk(emb, n_queries=N_QUERIES, k=K))
    normed = S.with_norm(emb)

    print(f"## ANN recall curves ({sf_dir}, n={n_vecs}, k={K}, "
          f"{N_QUERIES} queries)\n")
    print("### sign-LSH (planes=8)\n")
    print("| tables | probe_hamming | recall@10 | cand volume | vs brute | sec |")
    print("|---|---|---|---|---|---|")
    for tables in (4, 8, 16):
        for ph in (0, 1, 2):
            t0 = time.perf_counter()
            cands = S.lsh_candidate_set(
                normed, N_QUERIES, 8, tables, ph
            ).count()
            approx = topk_sets(
                S.cosine_topk_lsh(
                    emb,
                    n_queries=N_QUERIES,
                    k=K,
                    planes=8,
                    tables=tables,
                    probe_hamming=ph,
                )
            )
            dt = time.perf_counter() - t0
            r = recall(exact, approx)
            print(
                f"| {tables} | {ph} | {r:.2f} | {cands} "
                f"| {cands / brute_pairs:.2%} | {dt:.1f} |"
            )

    print("\n### IVF (Lloyd k-means lists)\n")
    print("| n_lists | n_probe | recall@10 | sec |")
    print("|---|---|---|---|")
    for n_lists in (8, 16):
        for n_probe in (1, 2, 4):
            t0 = time.perf_counter()
            approx = topk_sets(
                S.cosine_topk_ivf(
                    emb,
                    n_queries=N_QUERIES,
                    k=K,
                    n_lists=n_lists,
                    n_probe=n_probe,
                )
            )
            dt = time.perf_counter() - t0
            r = recall(exact, approx)
            print(f"| {n_lists} | {n_probe} | {r:.2f} | {dt:.1f} |")


if __name__ == "__main__":
    main()
