"""Stream -> lake ingestion: the bridge between the streaming sources
and the day-partitioned lake layout the batch operators read.

``foreachBatch`` appends each microbatch into the
``io_tables.write_day_partitioned`` layout (``__day=YYYY-MM-DD``
directories), so everything downstream — partition-pruned scans,
``compact_day_partitions`` small-file maintenance, the whole batch
operator registry — runs unchanged over live data.

Exactly-once story: the checkpoint makes microbatch REPLAY possible
after a crash, and a replayed ``foreachBatch`` would double-append.
Dedup on read is the lake-native answer: every row carries its batch id
(``__batch``), so readers drop duplicate (batch, row) pairs — or, as
real lakehouses do, the maintenance pass rewrites replayed batches
away.  ``read_ingested`` implements the reader-side guard with one
``dropDuplicates`` on the carried key columns.

Scale: each microbatch writes only the days it touches; a replay is
bounded by one microbatch; compaction later bin-packs the
one-file-per-batch-per-day output (see io_tables.compact_day_partitions
— built for exactly this producer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io_tables import write_day_partitioned


def start_lake_ingest(
    source: DataFrame,
    path: str,
    checkpoint: str,
    ts_col: str = "ts",
    trigger_available_now: bool = True,
):
    """Start ingesting a streaming frame into a day-partitioned lake
    dataset at ``path``; returns the StreamingQuery."""

    def write_batch(df: DataFrame, epoch_id: int) -> None:
        write_day_partitioned(
            df.withColumn("__batch", F.lit(epoch_id)),
            path,
            ts_col=ts_col,
            mode="append",
        )

    writer = source.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def committed_batches(table: str, app_id: str) -> set[int]:
    """Epoch ids already durably committed to the versioned table by
    ingest app ``app_id`` (scanned from the manifests — the manifests
    ARE the transaction log)."""
    from ..io_versioned import list_versions, read_manifest

    out: set[int] = set()
    for v in list_versions(table):
        m = read_manifest(table, v)
        if m.get("app") == app_id and m.get("batch") is not None:
            out.add(int(m["batch"]))
    return out


def start_versioned_ingest(
    source: DataFrame,
    table: str,
    checkpoint: str,
    app_id: str,
    trigger_available_now: bool = True,
):
    """Stream -> VERSIONED lake: each microbatch becomes one manifest
    commit (`io_versioned.commit_append`), so live data gets the full
    snapshot story — time travel to any batch boundary,
    ``snapshot_diff`` as exact per-batch CDC, ``vacuum`` for retention.

    Exactly-once is WRITER-side here (stronger than
    :func:`start_lake_ingest`'s reader-side dedup): every commit's
    manifest records the (``app``, ``batch``) transaction token, and a
    replayed ``foreachBatch`` (crash between commit and checkpoint
    advance, or a full re-run over the same source with the same
    ``app_id``) finds its epoch already committed and SKIPS — the
    Delta ``txnAppId``/``txnVersion`` idempotent-writer pattern on the
    JSON-manifest lake.  ``app_id`` names the logical ingest pipeline;
    epoch ids are only unique within one checkpoint lineage, so the
    token must carry both.

    At 100 TB: a commit appends only the microbatch's files to the
    manifest (KBs of JSON); the replay check reads manifests, not
    data.
    """
    from ..io_versioned import commit_append

    def write_batch(df: DataFrame, epoch_id: int) -> None:
        if epoch_id in committed_batches(table, app_id):
            return  # replayed batch: already durable, skip
        commit_append(
            df.withColumn("__batch", F.lit(epoch_id)),
            table,
            meta={"app": app_id, "batch": epoch_id},
        )

    writer = source.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_ingested(
    spark: SparkSession, path: str, key_cols: list[str] | None = None
) -> DataFrame:
    """Read an ingested dataset with the replay guard: duplicate rows
    from a replayed microbatch collapse on (key_cols or all columns).
    The ``__batch`` lineage column is dropped from the result."""
    df = spark.read.parquet(path)
    deduped = df.dropDuplicates(key_cols) if key_cols else df.dropDuplicates()
    return deduped.drop("__batch")
