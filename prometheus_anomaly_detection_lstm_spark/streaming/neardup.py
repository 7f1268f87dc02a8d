"""Streaming NEAR-duplicate ingest against a persisted signature index.

The production shape of continuous corpus building: documents arrive in
micro-batches; each batch must be near-dup-checked against EVERYTHING
ingested so far (not just its own batch) before it is admitted.  The
batch-side counterpart is ``operators.dedup.minhash_incremental_prebuilt``
(new day probes the bucketed corpus index); this module is its
Structured Streaming twin via ``foreachBatch``.

Why signature-ESTIMATED Jaccard for the verify step: the batch path
verifies candidates with exact shingle Jaccard, which needs the
matched corpus documents' shingle sets — at streaming cadence that
would re-read corpus text every micro-batch.  The index instead stores
each admitted doc's k minhash components, and the verifier scores
candidates by the fraction of matching components — the standard
unbiased estimator of Jaccard (E[est] = J), computed entirely from two
metadata-scale index rows.  Corpus text is never touched after
admission.

Scale shape per micro-batch (corpus size N, batch size b << N):
- signatures/buckets for the batch: map-only over b docs;
- candidate probe: equi-join of the batch's band buckets against the
  bucket index — with the index laid out bucketed (see
  ``dedup.build_dedup_index``) only the batch side shuffles;
- verify: candidates × one signature row per side, k equality checks;
- admission writes are batch-id-addressed directories, so a replayed
  epoch OVERWRITES its own output instead of duplicating it
  (idempotent by construction, the same discipline as
  ``streaming.ingest``).

No reference counterpart (the reference has no dedup surface); the
minhash/LSH machinery is shared with the batch operators.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import (
    MINHASH_K,
    band_buckets,
    minhash_signatures,
)

#: minimum signature-agreement fraction to call a candidate a near-dup.
#: With k=8 components the estimator's granularity is 1/8; 0.5 (>=4 of
#: 8 agree) rejects band-collision noise while catching J >~ 0.5 pairs.
EST_JACCARD_THRESHOLD = 0.5

_SIG_COLS = [f"sig_{i}" for i in range(1, MINHASH_K + 1)]


def _read_or_empty(
    spark: SparkSession, path: str, schema_src: DataFrame, exclude_batch: int
) -> DataFrame:
    """Read every ``batch=<id>`` directory under ``path`` EXCEPT the one
    for ``exclude_batch``.  A replayed epoch's own prior output must not
    be probed (its docs would self-match and reject the whole replay)
    nor read while the same directory is being overwritten."""
    dirs = []
    if os.path.isdir(path):
        dirs = [
            os.path.join(path, d)
            for d in sorted(os.listdir(path))
            if d.startswith("batch=") and d != f"batch={exclude_batch}"
            and os.path.isdir(os.path.join(path, d))
        ]
    if not dirs:
        return spark.createDataFrame([], schema_src.schema)
    return spark.read.schema(schema_src.schema).parquet(*dirs)


def neardup_admit_batch(
    batch: DataFrame,
    index_root: str,
    out_root: str,
    batch_id: int,
    threshold: float = EST_JACCARD_THRESHOLD,
) -> None:
    """Admit one micro-batch of (doc_id, text) docs against the index at
    ``index_root``; write admitted docs to ``out_root`` and near-dups to
    the dup log.  All outputs land under ``batch=<id>`` directories with
    overwrite mode — a replayed epoch rewrites itself (idempotent)."""
    spark = batch.sparkSession
    sigs = minhash_signatures(batch).persist()
    try:
        buckets = band_buckets(sigs)
        idx_sigs = _read_or_empty(
            spark, f"{index_root}/sigs", sigs, batch_id
        )
        idx_buckets = _read_or_empty(
            spark, f"{index_root}/buckets", buckets, batch_id
        )

        # cross-corpus candidates: index docs vs batch docs
        corpus_cands = (
            idx_buckets.alias("i")
            .join(
                F.broadcast(buckets.alias("n")),
                (F.col("i.band") == F.col("n.band"))
                & (F.col("i.bucket") == F.col("n.bucket")),
            )
            .select(
                F.col("i.doc_id").alias("old_id"),
                F.col("n.doc_id").alias("new_id"),
            )
            .distinct()
        )
        # within-batch candidates: keep-lowest-id wins, higher id drops
        batch_cands = (
            buckets.alias("a")
            .join(
                buckets.alias("b"),
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.bucket") == F.col("b.bucket"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(
                F.col("a.doc_id").alias("old_id"),
                F.col("b.doc_id").alias("new_id"),
            )
            .distinct()
        )
        all_sigs = idx_sigs.unionByName(sigs)
        dups = (
            corpus_cands.unionByName(batch_cands)
            .join(
                all_sigs.select(
                    F.col("doc_id").alias("old_id"),
                    *[F.col(c).alias(f"o_{c}") for c in _SIG_COLS],
                ).alias("o"),
                "old_id",
            )
            .join(
                sigs.select(
                    F.col("doc_id").alias("new_id"),
                    *[F.col(c).alias(f"n_{c}") for c in _SIG_COLS],
                ).alias("n"),
                "new_id",
            )
            .withColumn(
                "est_jaccard",
                sum(
                    F.when(
                        F.col(f"o_sig_{i}") == F.col(f"n_sig_{i}"), 1
                    ).otherwise(0)
                    for i in range(1, MINHASH_K + 1)
                )
                / F.lit(float(MINHASH_K)),
            )
            .filter(F.col("est_jaccard") >= threshold)
            .select("new_id", "old_id", F.round("est_jaccard", 6).alias("est_jaccard"))
        )
        # a doc that near-dups a LOWER-id doc (in the corpus or in this
        # batch) is rejected; everything else is admitted
        rejected_ids = dups.select(
            F.col("new_id").alias("doc_id")
        ).distinct()
        admitted = batch.join(rejected_ids, "doc_id", "left_anti")

        dups.write.mode("overwrite").parquet(
            f"{out_root}/duplog/batch={batch_id}"
        )
        admitted.write.mode("overwrite").parquet(
            f"{out_root}/admitted/batch={batch_id}"
        )
        # only ADMITTED docs join the index: a rejected near-dup must
        # not become a future match target (its keeper already is one)
        adm_sigs = sigs.join(rejected_ids, "doc_id", "left_anti")
        adm_sigs.write.mode("overwrite").parquet(
            f"{index_root}/sigs/batch={batch_id}"
        )
        band_buckets(adm_sigs).write.mode("overwrite").parquet(
            f"{index_root}/buckets/batch={batch_id}"
        )
    finally:
        sigs.unpersist()


def seed_neardup_index(docs: DataFrame, index_root: str) -> None:
    """Seed the streaming index from an EXISTING corpus — the bridge
    from a batch-built lake (``operators.dedup.build_dedup_index``
    holds the same banded bucket content as a catalog table) to the
    streaming probe's directory layout.  Written under ``batch=-1`` so
    no real epoch id can collide with it and replays never exclude it.
    """
    sigs = minhash_signatures(docs)
    sigs.write.mode("overwrite").parquet(f"{index_root}/sigs/batch=-1")
    band_buckets(sigs).write.mode("overwrite").parquet(
        f"{index_root}/buckets/batch=-1"
    )


def start_neardup_versioned_ingest(
    source: DataFrame,
    index_root: str,
    out_root: str,
    checkpoint: str,
    lake_table: str,
    app_id: str,
    threshold: float = EST_JACCARD_THRESHOLD,
    trigger_available_now: bool = True,
):
    """The full 100-TB incremental-corpus ingest path in ONE stream:
    micro-batches probe the persisted signature index
    (:func:`neardup_admit_batch`), and each batch's ADMITTED docs are
    committed as one version of an ``io_versioned`` lake table with the
    (``app``, ``batch``) idempotence token — so the growing corpus gets
    time travel, ``snapshot_diff`` as exact per-batch CDC, and
    writer-side exactly-once, while near-dups never enter it.

    Crash-safety ordering: admission writes are batch-id-addressed
    overwrites (idempotent), and the lake commit is skipped when its
    token is already in a manifest — a replayed epoch re-runs the
    admission (rewriting identical output) and leaves the lake alone.
    """
    from ..io_versioned import commit_append
    from .ingest import committed_batches

    def handle(batch: DataFrame, batch_id: int) -> None:
        bid = int(batch_id)
        neardup_admit_batch(batch, index_root, out_root, bid, threshold)
        if bid in committed_batches(lake_table, app_id):
            return  # replayed epoch: already durable, skip
        admitted = batch.sparkSession.read.parquet(
            f"{out_root}/admitted/batch={bid}"
        )
        commit_append(
            admitted.withColumn("__batch", F.lit(bid)),
            lake_table,
            meta={"app": app_id, "batch": bid},
        )

    writer = (
        source.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_neardup_ingest(
    source: DataFrame,
    index_root: str,
    out_root: str,
    checkpoint: str,
    threshold: float = EST_JACCARD_THRESHOLD,
    trigger_available_now: bool = True,
):
    """Wire a streaming (doc_id, text) source through
    :func:`neardup_admit_batch` via ``foreachBatch``."""

    def handle(batch: DataFrame, batch_id: int) -> None:
        neardup_admit_batch(
            batch, index_root, out_root, int(batch_id), threshold
        )

    writer = (
        source.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
