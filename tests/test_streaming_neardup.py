"""Streaming near-dup ingest: micro-batches probe the persisted
signature index, cross-BATCH near-dups are rejected, replays are
idempotent.  The streaming twin of minhash_incremental_prebuilt."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat "
    "watches from the warm stone wall near the old garden gate"
)
OTHER = (
    "completely different content about spark shuffles partitions "
    "joins aggregates and the catalyst optimizer rewriting plans"
)
THIRD = (
    "yet another unrelated document discussing parquet footers row "
    "groups statistics and predicate pushdown at the scan layer"
)


def _write_batch(spark, src: str, rows: list[tuple[int, str]]) -> None:
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(
        1
    ).write.mode("append").parquet(src)
    time.sleep(1.1)  # distinct mtimes -> deterministic file order


def test_streaming_neardup_ingest(spark, tmp_path):
    from prometheus_anomaly_detection_lstm_spark.streaming import neardup

    src = str(tmp_path / "src")
    idx = str(tmp_path / "index")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # batch 0: three distinct docs
    _write_batch(spark, src, [(1, BASE), (2, OTHER), (3, THIRD)])
    # batch 1: 11 = exact copy of 1 (cross-batch dup), 12 = new
    _write_batch(
        spark, src, [(11, BASE), (12, "a fresh short document " * 5)]
    )
    # batch 2: 21 = exact copy of 2 (dup of batch-0 doc),
    #          22 = exact copy of 12 (dup of an ADMITTED batch-1 doc),
    #          23 = new; 24 = exact copy of 23 (WITHIN-batch dup)
    _write_batch(
        spark,
        src,
        [
            (21, OTHER),
            (22, "a fresh short document " * 5),
            (23, "final unique text never seen before " * 3),
            (24, "final unique text never seen before " * 3),
        ],
    )

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = neardup.start_neardup_ingest(stream, idx, out, ckpt)
    q.awaitTermination(180)

    admitted = spark.read.parquet(f"{out}/admitted/batch=*").collect()
    duplog = spark.read.parquet(f"{out}/duplog/batch=*").collect()

    adm_ids = sorted(r.doc_id for r in admitted)
    assert adm_ids == [1, 2, 3, 12, 23]
    rejects = {r.new_id: r.old_id for r in duplog}
    assert rejects == {11: 1, 21: 2, 22: 12, 24: 23}
    # exact copies estimate Jaccard 1.0 from signatures alone
    assert all(abs(r.est_jaccard - 1.0) < 1e-9 for r in duplog)

    # index holds signatures for exactly the admitted docs
    idx_ids = sorted(
        r.doc_id for r in spark.read.parquet(f"{idx}/sigs/batch=*").collect()
    )
    assert idx_ids == [1, 2, 3, 12, 23]

    # replay with the SAME checkpoint: no new files -> no-op
    q2 = neardup.start_neardup_ingest(stream, idx, out, ckpt)
    q2.awaitTermination(60)
    assert (
        sorted(
            r.doc_id
            for r in spark.read.parquet(f"{out}/admitted/batch=*").collect()
        )
        == adm_ids
    )


def test_neardup_batch_is_idempotent(spark, tmp_path):
    """Re-admitting the same batch id overwrites itself bit-for-bit —
    the epoch-replay guarantee foreachBatch needs."""
    from prometheus_anomaly_detection_lstm_spark.streaming import neardup

    idx = str(tmp_path / "index")
    out = str(tmp_path / "out")
    batch = spark.createDataFrame(
        [(1, BASE), (2, OTHER)], "doc_id long, text string"
    )
    neardup.neardup_admit_batch(batch, idx, out, batch_id=0)
    first = sorted(
        r.doc_id for r in spark.read.parquet(f"{out}/admitted/batch=0").collect()
    )
    neardup.neardup_admit_batch(batch, idx, out, batch_id=0)  # replay
    again = sorted(
        r.doc_id for r in spark.read.parquet(f"{out}/admitted/batch=0").collect()
    )
    assert first == again == [1, 2]
    # the index did not double up either
    assert (
        spark.read.parquet(f"{idx}/sigs/batch=0").count() == 2
    )
