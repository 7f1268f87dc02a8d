"""Streaming frozen-LM quality gate: stream ≡ batch ≡ numpy replica,
micro-batch split invariance, and garbage rejection under a cutoff
frozen with the model."""

from __future__ import annotations

import time

import numpy as np
import pandas as pd

from prometheus_anomaly_detection_lstm_spark.streaming.quality_gate import (
    FrozenTrigramLM,
    freeze_lm,
    score_docs_batch,
    start_quality_gate,
)

DOC_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)

COMMON = "the quick brown fox jumps over the lazy dog again and again"
GARBAGE = "zzqxj vvkwp qqzzt xxjjy wwqqv kkzzx"


def _snapshot_docs(spark):
    """Mixed-quality snapshot: 20 common docs (low ppl) + 10 docs from
    a disjoint vocabulary (mid ppl) so the frozen 2/3-quantile cutoff
    sits ABOVE the common regime and below the odd one."""
    rows = [
        (i, COMMON + f" tail{i % 3}", "en", "src0", 60) for i in range(20)
    ]
    # each odd doc carries its own one-off letter soup, so its
    # trigrams are near-unique in the snapshot -> high ppl band
    rows += [
        (
            20 + i,
            f"q{i}wv{i}xj{i}kp{i}zt{i}my{i}bd{i}gh{i}ln{i}rs{i}fc",
            "en",
            "src1",
            60,
        )
        for i in range(10)
    ]
    return spark.createDataFrame(rows, DOC_SCHEMA)


def _incoming(doc_id0=100):
    return [
        {"doc_id": doc_id0, "text": COMMON + " tail1", "lang": "en",
         "source": "s", "n_chars": 60},
        {"doc_id": doc_id0 + 1, "text": COMMON + " fresh words appended",
         "lang": "en", "source": "s", "n_chars": 80},
        {"doc_id": doc_id0 + 2, "text": GARBAGE, "lang": "en",
         "source": "s", "n_chars": 35},
        {"doc_id": doc_id0 + 3, "text": COMMON, "lang": "en",
         "source": "s", "n_chars": 60},
    ]


def _numpy_ppl(lm: FrozenTrigramLM, text: str) -> float:
    lt = text.lower()
    den = lm.total + lm.vocab
    logs = [
        np.log((lm.counts.get(lt[i : i + 3], 0) + 1) / den)
        for i in range(len(lt) - 2)
    ]
    return round(float(np.exp(-np.mean(logs))), 6)


def test_freeze_and_batch_scoring_match_numpy(spark):
    lm = freeze_lm(_snapshot_docs(spark))
    assert lm.total > 0 and lm.vocab > 0 and np.isfinite(lm.keep_cutoff)
    rows = {
        r.doc_id: r
        for r in score_docs_batch(
            spark.createDataFrame(_incoming(), DOC_SCHEMA), lm
        ).collect()
    }
    for d in _incoming():
        r = rows[d["doc_id"]]
        assert r.ppl == _numpy_ppl(lm, d["text"]), d["doc_id"]
        # keep is exactly the frozen-cutoff predicate
        assert r.keep == int(r.ppl <= lm.keep_cutoff)
    # in-distribution docs pass, unseen-trigram garbage is dropped
    assert rows[100].keep == 1 and rows[103].keep == 1
    assert rows[102].keep == 0
    assert rows[102].ppl > rows[100].ppl


def _run_stream(spark, tmp_path, lm, batches, name):
    src = str(tmp_path / f"{name}_src")
    ck = str(tmp_path / f"{name}_ck")
    for rows in batches:
        spark.createDataFrame(pd.DataFrame(rows)).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        time.sleep(1.1)
    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = start_quality_gate(stream, lm, ck, query_name=name)
    q.awaitTermination(120)
    return {
        r.doc_id: (r.n_tris, r.ppl, r.keep)
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }


def test_stream_equals_batch_and_split_invariant(spark, tmp_path):
    lm = freeze_lm(_snapshot_docs(spark))
    docs = _incoming()
    one = _run_stream(spark, tmp_path, lm, [docs], "qg_one")
    split = _run_stream(
        spark, tmp_path, lm, [docs[:2], docs[2:]], "qg_split"
    )
    assert one == split and len(one) == len(docs)
    batch = {
        r.doc_id: (r.n_tris, r.ppl, r.keep)
        for r in score_docs_batch(
            spark.createDataFrame(docs, DOC_SCHEMA), lm
        ).collect()
    }
    assert one == batch


def test_sub_trigram_docs_flow_through_with_keep_zero(spark):
    lm = freeze_lm(_snapshot_docs(spark))
    docs = _incoming() + [
        {"doc_id": 200, "text": "ab", "lang": "en", "source": "s",
         "n_chars": 2},
        {"doc_id": 201, "text": "", "lang": "en", "source": "s",
         "n_chars": 0},
    ]
    rows = {
        r.doc_id: r
        for r in score_docs_batch(
            spark.createDataFrame(pd.DataFrame(docs)), lm
        ).collect()
    }
    # no doc_id is silently lost (r7 ADVICE) — sub-trigram docs emit
    # keep=0 with no ppl instead of vanishing from the keep-set join
    assert set(rows) == {d["doc_id"] for d in docs}
    for did in (200, 201):
        assert rows[did].n_tris == 0 and rows[did].keep == 0
        assert rows[did].ppl is None or np.isnan(rows[did].ppl)


def test_cutoff_is_frozen_in_engine_and_separates_regimes(spark):
    snapshot = _snapshot_docs(spark)
    lm = freeze_lm(snapshot)
    scored = {
        r.doc_id: r.ppl
        for r in score_docs_batch(snapshot, lm).collect()
    }
    common = [scored[i] for i in range(20)]
    odd = [scored[20 + i] for i in range(10)]
    # the frozen 2/3-tercile boundary keeps the common regime and
    # rejects the letter-soup regime on the snapshot itself
    assert max(common) <= lm.keep_cutoff < min(odd)
    kept = sum(1 for p in scored.values() if p <= lm.keep_cutoff)
    assert 0.6 <= kept / len(scored) <= 0.75
