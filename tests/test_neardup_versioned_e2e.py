"""The 100-TB incremental-corpus ingest path, end to end in one pin
(round-5 verdict task 5): micro-batches arrive as a stream, probe the
PERSISTED signature index seeded from an existing corpus, admitted docs
commit to a VERSIONED lake (one version per batch, idempotence token),
and the final corpus equals the batch dedup rerun over everything.

Duplicate groups in the fixture are exact-copy CLIQUES (every member
matches every other), so greedy sequential admission (streaming) and
connected-components keep-min (batch ``dedup_apply``) provably agree —
the equivalence asserted here is the COMPOSITION, not luck of ordering.
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F

DOC_A = (
    "the quick brown fox jumps over the lazy dog while the cat "
    "watches from the warm stone wall near the old garden gate"
)
DOC_B = (
    "completely different content about spark shuffles partitions "
    "joins aggregates and the catalyst optimizer rewriting plans"
)
DOC_C = (
    "yet another unrelated document discussing parquet footers row "
    "groups statistics and predicate pushdown at the scan layer"
)
DOC_D = "a fresh short document about versioned manifests " * 4
DOC_E = "final unique text never seen before in any corpus " * 3
DOC_F = "one more genuinely novel document closing the stream " * 4


def _write_batch(spark, src: str, rows: list[tuple[int, str]]) -> None:
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(
        1
    ).write.mode("append").parquet(src)
    time.sleep(1.1)  # distinct mtimes -> deterministic file order


def test_neardup_versioned_ingest_equals_batch_rerun(spark, tmp_path):
    from prometheus_anomaly_detection_lstm_spark import io_versioned as V
    from prometheus_anomaly_detection_lstm_spark.operators.dedup import (
        dedup_apply,
        minhash_lsh_dedup,
    )
    from prometheus_anomaly_detection_lstm_spark.streaming import neardup

    src = str(tmp_path / "src")
    idx = str(tmp_path / "index")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    lake = str(tmp_path / "corpus_lake")

    # ---- seed: an existing 3-doc corpus becomes the probe index ----
    seed_rows = [(1, DOC_A), (2, DOC_B), (3, DOC_C)]
    seed = spark.createDataFrame(seed_rows, "doc_id long, text string")
    neardup.seed_neardup_index(seed, idx)

    # ---- three micro-batches; dups span seed/batch boundaries ----
    # batch 0: 11 = copy of SEED doc 1 (rejected), 12 = new
    _write_batch(spark, src, [(11, DOC_A), (12, DOC_D)])
    # batch 1: 21 = copy of ADMITTED batch-0 doc 12 (rejected), 22 = new
    _write_batch(spark, src, [(21, DOC_D), (22, DOC_E)])
    # batch 2: 31 = copy of 22 (rejected), 32/33 = within-batch clique
    # of a new doc (33 rejected against 32), 34 = copy of seed doc 2
    _write_batch(
        spark, src, [(31, DOC_E), (32, DOC_F), (33, DOC_F), (34, DOC_B)]
    )

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = neardup.start_neardup_versioned_ingest(
        stream, idx, out, ckpt, lake, app_id="corpus_ingest"
    )
    q.awaitTermination(240)

    # ---- one lake version per micro-batch, in epoch order ----
    versions = V.list_versions(lake)
    assert len(versions) == 3
    lake_rows = V.read_version(spark, lake).collect()
    lake_ids = sorted(r.doc_id for r in lake_rows)
    assert lake_ids == [12, 22, 32]
    assert {r.doc_id: r["__batch"] for r in lake_rows} == {
        12: 0, 22: 1, 32: 2,
    }

    # snapshot_diff between consecutive versions is EXACTLY that
    # batch's admissions (per-batch CDC)
    added, removed = V.snapshot_diff(spark, lake, versions[1], versions[2])
    assert removed is None
    assert sorted(r.doc_id for r in added.collect()) == [32]

    # ---- equivalence: final corpus == the batch dedup_apply rerun ----
    all_rows = seed_rows + [
        (11, DOC_A), (12, DOC_D), (21, DOC_D), (22, DOC_E),
        (31, DOC_E), (32, DOC_F), (33, DOC_F), (34, DOC_B),
    ]
    everything = spark.createDataFrame(
        all_rows, "doc_id long, text string"
    )
    pairs = minhash_lsh_dedup(everything, threshold=0.5)
    batch_survivors = sorted(
        r.doc_id for r in dedup_apply(everything, pairs).collect()
    )
    streaming_corpus = sorted(
        [r[0] for r in seed_rows] + lake_ids
    )
    assert streaming_corpus == batch_survivors == [1, 2, 3, 12, 22, 32]

    # ---- replay with the same checkpoint: stream AND lake are no-ops
    q2 = neardup.start_neardup_versioned_ingest(
        stream, idx, out, ckpt, lake, app_id="corpus_ingest"
    )
    q2.awaitTermination(60)
    assert V.list_versions(lake) == versions
    assert sorted(
        r.doc_id for r in V.read_version(spark, lake).collect()
    ) == lake_ids

    # ---- fresh checkpoint, same app_id: writer-side token dedupes ----
    q3 = neardup.start_neardup_versioned_ingest(
        stream, idx, out, str(tmp_path / "ckpt2"), lake,
        app_id="corpus_ingest",
    )
    q3.awaitTermination(240)
    assert V.list_versions(lake) == versions
