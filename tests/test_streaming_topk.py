"""Streaming Misra-Gries heavy hitters: guarantee vs exact counts,
bounded state, and robustness to micro-batch splits."""

from __future__ import annotations

import time
from collections import Counter

import pandas as pd

from prometheus_anomaly_detection_lstm_spark.streaming.topk import (
    MG_CAPACITY,
    N_SHARDS,
    streaming_heavy_hitters,
)

CAP = 8


def _run(spark, tmp_path, batches, name, capacity=CAP):
    src = str(tmp_path / f"{name}_src")
    ck = str(tmp_path / f"{name}_ck")
    for rows in batches:
        spark.createDataFrame(pd.DataFrame(rows)).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        time.sleep(1.1)
    stream = spark.readStream.schema("doc_id long, text string").option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    q = (
        streaming_heavy_hitters(stream, capacity=capacity)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql(f"SELECT * FROM {name}").collect()
    # final summary = per shard, the highest batch_seq emission
    final: dict[str, int] = {}
    by_shard_seq: dict[int, int] = {}
    for r in rows:
        by_shard_seq[r["shard"]] = max(
            by_shard_seq.get(r["shard"], 0), r["batch_seq"]
        )
    for r in rows:
        if r["batch_seq"] == by_shard_seq[r["shard"]]:
            final[r["token"]] = r["mg_count"]
    return final


def _docs(doc_id, words):
    return [{"doc_id": doc_id, "text": " ".join(words)}]


def test_mg_guarantee_and_bounds(spark, tmp_path):
    """Tokens above the MG threshold survive; emitted counts are lower
    bounds <= true counts; state stays within capacity per shard."""
    words1 = ["hot"] * 30 + ["warm"] * 12 + [f"cold{i}" for i in range(40)]
    words2 = ["hot"] * 25 + ["warm"] * 10 + [f"rare{i}" for i in range(40)]
    final = _run(
        spark,
        tmp_path,
        [_docs(1, words1), _docs(2, words2)],
        "mg_two",
    )
    true = Counter(words1) + Counter(words2)
    n = sum(true.values())
    # every token with true count > N / (capacity+1) must survive
    # (N per shard <= N total, so the global threshold is conservative)
    for tok, c in true.items():
        if c > n / (CAP + 1):
            assert tok in final, (tok, c)
    # lower bounds never exceed true counts
    for tok, c in final.items():
        assert c <= true[tok], (tok, c, true[tok])
    # "hot" dominates: its bound stays close (decrements <= N/(cap+1))
    assert final["hot"] >= true["hot"] - n // (CAP + 1)


def test_mg_split_invariance_of_guarantee(spark, tmp_path):
    """The survival guarantee holds whether the stream arrives as one
    batch or three (bounds may differ; survivorship of true heavy
    hitters must not)."""
    words = (
        ["alpha"] * 50
        + ["beta"] * 30
        + ["gamma"] * 20
        + [f"noise{i}" for i in range(60)]
    )
    one = _run(spark, tmp_path, [_docs(1, words)], "mg_one")
    three = _run(
        spark,
        tmp_path,
        [
            _docs(1, words[:50]),
            _docs(2, words[50:100]),
            _docs(3, words[100:]),
        ],
        "mg_three",
    )
    n = len(words)
    heavy = {"alpha", "beta", "gamma"}
    for tok in heavy:
        assert tok in one
        assert tok in three


def test_mg_state_bounded(spark, tmp_path):
    """With a vocabulary far larger than capacity, every emitted shard
    summary holds at most `capacity` tokens."""
    words = [f"w{i}" for i in range(300)] + ["big"] * 50
    name = "mg_bound"
    final = _run(spark, tmp_path, [_docs(1, words)], name, capacity=CAP)
    rows = spark.sql(f"SELECT * FROM {name}").collect()
    per_shard = Counter((r["shard"], r["batch_seq"]) for r in rows)
    assert all(v <= CAP for v in per_shard.values()), per_shard
    assert "big" in final
