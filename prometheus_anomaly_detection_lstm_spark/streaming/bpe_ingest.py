"""Streaming tokenizer-count ingest: frozen-BPE encode at arrival time.

The batch pass (``operators.bpe.encode_token_counts``) tokenizes a
corpus snapshot; at ingest the production shape is the same FROZEN
merge list applied to every arriving micro-batch — token budgets,
packing plans and dedup stats all key off these counts, so they are
computed once, on the way in, not re-derived per consumer.

Shape: the merge list is a constant riding the closure (a real
tokenizer's merge table is KBs); each micro-batch runs the batch
encoder verbatim via ``foreachBatch`` — the vocabulary memoization
(fold once per DISTINCT word, broadcast join back) applies within the
batch, and per-doc outputs are independent of batching, so
stream ≡ batch holds by construction and is pinned in
``tests/test_streaming_bpe.py``.  Map-only + batch-local joins: no
cross-batch state, embarrassingly parallel at 100 TB/day.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators.bpe import FROZEN_MERGES, encode_token_counts


def start_bpe_ingest(
    source: DataFrame,
    out_root: str,
    checkpoint: str,
    merges: list[tuple[str, str]] | None = None,
    trigger_available_now: bool = True,
):
    """Wire the frozen-BPE encoder to a streaming source of
    (doc_id, text, ...) rows; each micro-batch's per-doc
    (n_words, n_bpe_tokens, n_chars_tokenized) land as one parquet
    batch directory under ``out_root`` (production swaps the sink for
    the versioned lake, as the neardup ingest does)."""
    frozen = merges or FROZEN_MERGES

    def handle(batch: DataFrame, batch_id: int) -> None:
        encode_token_counts(batch, frozen).write.mode("overwrite").parquet(
            f"{out_root}/batch={batch_id}"
        )

    writer = source.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
