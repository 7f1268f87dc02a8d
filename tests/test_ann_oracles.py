"""Pins for the exact hash oracles over the APPROXIMATE ANN queries
(r8 verdict task 2): the oracles replicate the deterministic bucketing
(LSH hyperplanes / Lloyd lists / PQ codebooks) in DuckDB and then
rerank exactly, so every discrete decision must agree bit-for-bit or
by a margin far above cross-engine float noise.

Three invariants carry the whole construction:
1. hyperplane weights: DuckDB `s - trunc(s)` == Python math.fmod(s, 1)
   bit-exact (DuckDB's fmod flips the sign convention for negatives);
2. sequential folds: DuckDB list_dot_product / list_reduce == Spark's
   F.aggregate fold == strict left-to-right accumulation, bit-exact;
3. decision margins: min |hyperplane dot|, Lloyd argmin margin, probe
   rank gap, ADC shortlist gap, top-k gap all >= ~1e-7 at every test
   sf — ~1e6x the measured blocked-BLAS-vs-sequential noise (<=4e-15).
"""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pytest

from prometheus_anomaly_detection_lstm_spark.operators.similarity import (
    EMB_DIM,
    LSH_RECALL08,
    _lsh_weight,
)

SF = "/root/testdata/sf0.001"


def _load_vecs() -> np.ndarray:
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF}/embeddings.parquet")
    ids = np.asarray(t["vec_id"])
    M = np.stack(
        [np.asarray(v, dtype=np.float64) for v in t["embedding"].to_pylist()]
    )
    return M[np.argsort(ids)]


def test_duckdb_weight_bit_parity():
    """Every production LSH hyperplane weight must round-trip through
    the oracle's sin/trunc expression bit-exactly."""
    planes, tables = LSH_RECALL08["planes"], LSH_RECALL08["tables"]
    rows = duckdb.connect().execute(
        f"""
        SELECT t, p, j, (s - trunc(s)) * 2.0 - 1.0 AS w
        FROM (
          SELECT t, p, j,
                 sin((t * {planes} + 1 + p) * 1000.0 + j) * 43758.5453 AS s
          FROM generate_series(0, {tables - 1}) ts(t),
               generate_series(0, {planes - 1}) ps(p),
               generate_series(0, {EMB_DIM - 1}) js(j)
        )
        """
    ).fetchall()
    assert len(rows) == tables * planes * EMB_DIM
    for t, p, j, w in rows:
        assert _lsh_weight(t * planes + 1, p, j) == w


def test_duckdb_fmod_sign_convention_differs():
    """Document WHY the oracle avoids fmod: DuckDB fmod of a negative
    dividend disagrees with C/Python fmod on this corpus of inputs —
    if this ever starts passing, the trunc workaround can be dropped."""
    s = math.sin(1003.0) * 43758.5453  # the (t=0,p=0,j=3) weight input; negative
    duck = duckdb.connect().execute(
        f"SELECT fmod({s!r}::DOUBLE, 1.0)"
    ).fetchone()[0]
    assert duck != math.fmod(s, 1.0)


def test_duckdb_list_dot_product_is_sequential_fold():
    """DuckDB list_dot_product == strict left-to-right accumulation
    (what Spark's F.aggregate fold computes), bit-exact on real data."""
    M = _load_vecs()
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT vec_id, list_dot_product(embedding::DOUBLE[],
                                        embedding::DOUBLE[]) AS d
        FROM '{SF}/embeddings.parquet' ORDER BY vec_id
        """
    ).fetchall()
    for (vid, d), v in zip(rows, M):
        acc = 0.0
        for x in v:
            acc += x * x
        assert acc == d


def test_decision_margins_dwarf_float_noise():
    """Sign margins and Lloyd argmin margins at the smallest sf must
    exceed 1e-8 — six orders above summation-order noise.  (The full
    sweep across sf0.001/0.01/0.1 and all decision classes lives in
    tools/ann_oracle_margins.py; this is the fast canary.)"""
    from prometheus_anomaly_detection_lstm_spark.operators.similarity import (
        IVF_RECALL08,
    )

    M = _load_vecs()
    planes, tables = LSH_RECALL08["planes"], LSH_RECALL08["tables"]
    W = np.array(
        [
            [_lsh_weight(t * planes + 1, p, j) for j in range(EMB_DIM)]
            for t in range(tables)
            for p in range(planes)
        ]
    ).T
    assert np.abs(M @ W).min() > 1e-8

    n_lists = IVF_RECALL08["n_lists"]
    cents = M[:n_lists].copy()
    for _ in range(6):
        sims = M @ cents.T
        top2 = np.sort(sims, axis=1)[:, -2:]
        assert (top2[:, 1] - top2[:, 0]).min() > 1e-8
        assign = np.argmax(sims, axis=1)
        for c in range(n_lists):
            mem = M[assign == c]
            if len(mem):
                cents[c] = mem.mean(axis=0)


@pytest.mark.parametrize(
    "name",
    ["ann_cosine_topk_lsh", "ann_cosine_topk_ivf", "ann_cosine_topk_pq"],
)
def test_ann_oracles_registered(name):
    """The three ANN approximators must carry REAL oracles now — a
    regression to None silently demotes them to rows-only grading."""
    from prometheus_anomaly_detection_lstm_spark import registry

    fn, oracle = registry.all_queries()[name]
    assert oracle is not None and "row_number" in oracle
