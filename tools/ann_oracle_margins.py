"""Measure the cross-engine knife-edge margins that decide whether the
ANN LSH/IVF queries can carry exact DuckDB hash oracles (round-8
verdict task 2).

The Spark side computes LSH signatures with a blocked BLAS matmul and
k-means means with partial aggregation; DuckDB's list_dot_product/avg
sum in a different order.  The two engines agree on every DISCRETE
decision (sign bit, argmax assignment, probe rank, top-k rank) iff the
raw float margin at each decision exceeds the summation-order noise
(~1e-13 on 64-term dots).  This tool measures the minimum margin of
every decision class at a given sf dir, in BOTH summation orders, so
the oracle conversion is evidence-based rather than hoped.

Run: python tools/ann_oracle_margins.py [sf_dir ...]
"""

from __future__ import annotations

import sys

import numpy as np
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

from prometheus_anomaly_detection_lstm_spark.operators.similarity import (  # noqa: E402
    EMB_DIM,
    IVF_RECALL08,
    LSH_RECALL08,
    N_QUERIES,
    TOP_K,
    _lsh_weight,
)


def load(sf_dir: str) -> np.ndarray:
    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    ids = np.asarray(t["vec_id"])
    M = np.stack(
        [np.asarray(v, dtype=np.float64) for v in t["embedding"].to_pylist()]
    )
    order = np.argsort(ids)
    return M[order]


def seq_matmul(M: np.ndarray, W: np.ndarray) -> np.ndarray:
    """Strict left-to-right-sequential dot products (DuckDB order)."""
    acc = np.zeros((M.shape[0], W.shape[1]))
    for j in range(M.shape[1]):
        acc += M[:, j : j + 1] * W[j : j + 1, :]
    return acc


def lsh_margins(M: np.ndarray) -> None:
    planes, tables = LSH_RECALL08["planes"], LSH_RECALL08["tables"]
    W = np.array(
        [
            [_lsh_weight(t * planes + 1, p, j) for j in range(EMB_DIM)]
            for t in range(tables)
            for p in range(planes)
        ]
    ).T
    blas = M @ W
    seq = seq_matmul(M, W)
    print(f"  LSH: hyperplane dots: {blas.size}")
    print(f"    min |dot| (blas): {np.abs(blas).min():.3e}")
    print(f"    max |blas - seq|: {np.abs(blas - seq).max():.3e}")
    print(f"    sign flips blas vs seq: {int(((blas > 0) != (seq > 0)).sum())}")


def kmeans(M: np.ndarray, n_lists: int, iters: int = 5, seq: bool = False):
    cents = M[:n_lists].copy()
    margins = []
    for _ in range(iters + 1):  # 5 recomputes + final assignment
        sims = seq_matmul(M, cents.T) if seq else M @ cents.T
        top2 = np.sort(sims, axis=1)[:, -2:]
        margins.append((top2[:, 1] - top2[:, 0]).min())
        assign = np.argmax(sims, axis=1)  # ties: lowest index = centroid_id asc
        new = np.zeros_like(cents)
        for c in range(n_lists):
            members = M[assign == c]
            if len(members):
                new[c] = members.mean(axis=0)
        cents = new
    return cents, assign, sims, min(margins)


def ivf_margins(M: np.ndarray) -> None:
    n_lists, n_probe = IVF_RECALL08["n_lists"], IVF_RECALL08["n_probe"]
    cents_b, assign_b, sims_b, m_b = kmeans(M, n_lists, seq=False)
    cents_s, assign_s, sims_s, m_s = kmeans(M, n_lists, seq=True)
    print(f"  IVF: assignment flips blas vs seq: {int((assign_b != assign_s).sum())}")
    print(f"    min assignment margin (blas/seq): {m_b:.3e} / {m_s:.3e}")
    print(f"    max |centroid diff|: {np.abs(cents_b - cents_s).max():.3e}")
    # probe-rank margin: gap between the n_probe-th and (n_probe+1)-th
    # centroid sim for each query vector
    qs = np.sort(sims_b[:N_QUERIES], axis=1)
    print(
        f"    min probe-rank gap (rank {n_probe} vs {n_probe+1}): "
        f"{(qs[:, -n_probe] - qs[:, -n_probe - 1]).min():.3e}"
    )
    topk_margins(M, assign_b, sims_b, cents_b, n_probe, "IVF")


def topk_margins(M, assign, sims, cents, n_probe, label) -> None:
    """Min adjacent raw-cosine gap around the top-k boundary for the
    IVF candidate sets (brute-force precedent covers the LSH pairs —
    same cosine arithmetic; here the candidate set differs)."""
    norms = np.sqrt((M * M).sum(axis=1))
    worst = np.inf
    for q in range(N_QUERIES):
        probed = np.argsort(-sims[q])[:n_probe]
        cand = np.where(np.isin(assign, probed))[0]
        cand = cand[cand != q]
        cos = (M[cand] @ M[q]) / (norms[cand] * norms[q])
        srt = np.sort(cos)[::-1][: TOP_K + 1]
        gaps = -np.diff(srt)
        gaps = gaps[gaps > 0]  # exact ties break by c_id identically
        if len(gaps):
            worst = min(worst, gaps.min())
    print(f"    {label} top-k adjacent nonzero cosine gap min: {worst:.3e}")


def pq_margins(M: np.ndarray) -> None:
    """Replica of kmeans.pq_topk's decision points in two summation
    orders for the codebook means (Spark partial-agg vs DuckDB
    sequential): assignment argmin margins per train iteration,
    ADC-shortlist boundary gap, final top-k gap.  Dots themselves are
    bit-identical across engines (sequential folds on both sides,
    verified in tests/test_ann_oracles.py), so the mean is the only
    noise source."""
    from prometheus_anomaly_detection_lstm_spark.operators.kmeans import (
        PQ_RERANK,
        PQ_SEARCH_K,
        PQ_SEARCH_M,
        PQ_TRAIN_ITERS,
    )

    m, kcode, iters = PQ_SEARCH_M, PQ_SEARCH_K, PQ_TRAIN_ITERS
    dsub = EMB_DIM // m
    U = M / np.sqrt((M * M).sum(axis=1))[:, None]

    def train(seq: bool):
        cbs = [
            U[:kcode, mi * dsub : (mi + 1) * dsub].copy() for mi in range(m)
        ]
        margins = []
        for _ in range(iters):
            for mi in range(m):
                sub = U[:, mi * dsub : (mi + 1) * dsub]
                d = ((sub[:, None, :] - cbs[mi][None, :, :]) ** 2).sum(axis=2)
                s = np.sort(d, axis=1)
                margins.append((s[:, 1] - s[:, 0]).min())
                a = d.argmin(axis=1)
                for c in range(kcode):
                    mem = sub[a == c]
                    if len(mem):
                        cbs[mi][c] = (
                            np.array(
                                [seq_matmul(mem.T, np.ones((len(mem), 1)))[
                                    :, 0
                                ]]
                            )[0]
                            / len(mem)
                            if seq
                            else mem.mean(axis=0)
                        )
        return cbs, min(margins)

    cb_b, m_b = train(False)
    cb_s, m_s = train(True)
    print(f"  PQ: min assignment margin (blas/seq means): {m_b:.3e} / {m_s:.3e}")
    print(
        "    max |codebook diff| blas vs seq: "
        f"{max(np.abs(a - b).max() for a, b in zip(cb_b, cb_s)):.3e}"
    )
    # ADC shortlist boundary + final top-k gaps
    codes = np.zeros((len(U), m), dtype=int)
    for mi in range(m):
        sub = U[:, mi * dsub : (mi + 1) * dsub]
        codes[:, mi] = (
            ((sub[:, None, :] - cb_b[mi][None, :, :]) ** 2).sum(axis=2)
        ).argmin(axis=1)
    worst_short, worst_topk = np.inf, np.inf
    for q in range(N_QUERIES):
        adc = np.zeros(len(U))
        for mi in range(m):
            qs = U[q, mi * dsub : (mi + 1) * dsub]
            lut = ((cb_b[mi] - qs[None, :]) ** 2).sum(axis=1)
            adc += lut[codes[:, mi]]
        adc = np.delete(adc, q)
        s = np.sort(adc)
        lim = TOP_K * PQ_RERANK
        if len(s) > lim:
            gap = s[lim] - s[lim - 1]
            if gap > 0:
                worst_short = min(worst_short, gap)
        short_ids = np.argsort(adc, kind="stable")[:lim]
        ids = np.delete(np.arange(len(U)), q)[short_ids]
        cos = U[ids] @ U[q]
        srt = np.sort(cos)[::-1][: TOP_K + 1]
        gaps = -np.diff(srt)
        gaps = gaps[gaps > 0]
        if len(gaps):
            worst_topk = min(worst_topk, gaps.min())
    print(f"    PQ shortlist boundary gap min: {worst_short:.3e}")
    print(f"    PQ top-k adjacent nonzero cosine gap min: {worst_topk:.3e}")


def main() -> None:
    for sf_dir in sys.argv[1:] or [
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ]:
        M = load(sf_dir)
        print(f"{sf_dir}: {M.shape[0]} vectors x {M.shape[1]} dims")
        lsh_margins(M)
        ivf_margins(M)
        pq_margins(M)


if __name__ == "__main__":
    main()
