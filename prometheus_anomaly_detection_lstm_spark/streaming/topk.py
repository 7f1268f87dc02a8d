"""Streaming heavy hitters with BOUNDED state (batched Misra-Gries).

The batch engine finds frequent tokens exactly
(operators/text.frequent_tokens: sketch-then-verify); on an unbounded
stream the exact state (one counter per distinct token) grows with the
vocabulary.  This operator keeps a Misra-Gries summary of capacity m
PER HASH SHARD instead: state size is m entries per shard — constant in
stream length and vocabulary — while every token whose true count
exceeds N_shard/(m+1) is GUARANTEED to survive (the classic MG bound;
batch merging subtracts the (m+1)-th largest merged count from all,
which preserves it).

Sharding: tokens hash (xxhash64, session-stable) into ``n_shards``
groups, so a token's whole history lands in one state cell and the MG
guarantee applies per shard; parallelism and memory scale with the
shard count, not the vocabulary.  Emitted counts are LOWER BOUNDS
(true count minus at most the shard's accumulated decrement), exactly
as in the published sketch; the batch engine's exact recount is the
verification stage at rest.

Reference analog: the engine-side top-k diagnostics the reference
delegates to PromQL topk() (config.yaml); here the stream computes its
own candidates with bounded memory.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "shard int, token string, mg_count long, batch_seq long"
STATE_SCHEMA = "tokens array<string>, counts array<long>, batch_seq long"

MG_CAPACITY = 16
N_SHARDS = 4


def make_mg_fn(capacity: int = MG_CAPACITY):
    """Per-shard batched Misra-Gries merge (plain-value closure)."""

    def mg(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        batch = pd.concat(list(pdfs), ignore_index=True)
        merged: dict[str, int] = {}
        if state.exists:
            toks, cnts, seq = state.get
            merged.update(zip(toks, cnts))
        else:
            seq = 0
        for tok, c in batch["token"].value_counts().items():
            merged[tok] = merged.get(tok, 0) + int(c)
        if len(merged) > capacity:
            # subtract the (m+1)-th largest count from everyone and
            # keep the strictly-positive survivors: the batched MG
            # decrement (deterministic — ties at the pivot all drop).
            pivot = sorted(merged.values(), reverse=True)[capacity]
            merged = {
                t: c - pivot for t, c in merged.items() if c - pivot > 0
            }
        seq += 1
        items = sorted(merged.items())
        state.update((
            [t for t, _ in items],
            [c for _, c in items],
            seq,
        ))
        yield pd.DataFrame(
            {
                "shard": [key[0]] * len(items),
                "token": [t for t, _ in items],
                "mg_count": [c for _, c in items],
                "batch_seq": [seq] * len(items),
            }
        )

    return mg


def streaming_heavy_hitters(
    docs: DataFrame,
    capacity: int = MG_CAPACITY,
    n_shards: int = N_SHARDS,
) -> DataFrame:
    """Wire a streaming (doc_id, text) source through tokenize ->
    hash-shard -> per-shard MG state.  Caller attaches sink/checkpoint.
    """
    tokens = docs.select(
        F.explode(
            F.split(F.lower(F.col("text")), r"\s+")
        ).alias("token")
    ).filter(F.col("token") != "")
    sharded = tokens.withColumn(
        "shard", F.pmod(F.xxhash64("token"), F.lit(n_shards)).cast("int")
    )
    return sharded.groupBy("shard").applyInPandasWithState(
        make_mg_fn(capacity),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
