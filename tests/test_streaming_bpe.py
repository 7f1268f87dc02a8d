"""Streaming frozen-BPE ingest: stream ≡ batch and micro-batch split
invariance for the tokenizer-count pass."""

from __future__ import annotations

import time

import pandas as pd

from prometheus_anomaly_detection_lstm_spark.operators.bpe import (
    FROZEN_MERGES,
    encode_token_counts,
)
from prometheus_anomaly_detection_lstm_spark.streaming.bpe_ingest import (
    start_bpe_ingest,
)

DOC_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)

DOCS = [
    {"doc_id": 1, "text": "the erstwhile miner parts were interesting",
     "lang": "en", "source": "s", "n_chars": 43},
    {"doc_id": 2, "text": "ararara starts merger stories in lower towns",
     "lang": "en", "source": "s", "n_chars": 45},
    {"doc_id": 3, "text": "interesting parts are in the part of stories",
     "lang": "en", "source": "s", "n_chars": 45},
    {"doc_id": 4, "text": "x " + "a" * 30, "lang": "en", "source": "s",
     "n_chars": 32},
]


def _run_stream(spark, tmp_path, batches, name):
    src = str(tmp_path / f"{name}_src")
    out = str(tmp_path / f"{name}_out")
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
    q = start_bpe_ingest(stream, out, ck)
    q.awaitTermination(120)
    return {
        r.doc_id: (r.n_words, r.n_bpe_tokens, r.n_chars_tokenized)
        for r in spark.read.parquet(f"{out}/batch=*").collect()
    }


def test_stream_equals_batch_and_split_invariant(spark, tmp_path):
    one = _run_stream(spark, tmp_path, [DOCS], "bpe_one")
    split = _run_stream(spark, tmp_path, [DOCS[:2], DOCS[2:]], "bpe_split")
    assert one == split and len(one) == len(DOCS)
    batch = {
        r.doc_id: (r.n_words, r.n_bpe_tokens, r.n_chars_tokenized)
        for r in encode_token_counts(
            spark.createDataFrame(DOCS, DOC_SCHEMA), FROZEN_MERGES
        ).collect()
    }
    assert one == batch
