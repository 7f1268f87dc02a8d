"""Streaming perplexity quality gate: score INCOMING documents against
a FROZEN character-trigram LM snapshot.

The batch operator (``plans/wave11.perplexity_filter``) trains its LM
on the corpus it scores — right for offline curation.  At ingest time
the production shape is different: the model is frozen from an
existing corpus snapshot (CCNet ships a pretrained KenLM; here the
trigram table), broadcast, and every arriving micro-batch is scored
against it — no per-batch retraining, no stateful shuffle, a pure
Arrow-batched map over the stream.

Scoring against a frozen model needs smoothing (a new doc can carry
trigrams the snapshot never saw): Laplace over the snapshot
vocabulary, ppl(d) = exp(-mean_tris ln((c+1)/(total+V))).  The keep
cut is frozen WITH the model (by default the snapshot's tail-tercile
boundary recomputed under the smoothed score — the same head+middle
curriculum as the batch operator).

Scale: the model is charset³-bounded (vocabulary scale, MBs) and rides
the closure into an Arrow ``mapInPandas`` — executors score batches
with zero shuffle; at 100 TB/day this is embarrassingly parallel.
``tests/test_quality_gate_streaming.py`` pins stream ≡ batch ≡ numpy
replica and micro-batch split invariance.
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

OUT_SCHEMA = "doc_id long, n_tris bigint, ppl double, keep bigint"


@dataclass(frozen=True)
class FrozenTrigramLM:
    """Immutable LM snapshot: trigram -> count, plus totals and the
    frozen keep cutoff (smoothed-ppl tail-tercile boundary)."""

    counts: dict[str, int]
    total: int
    vocab: int
    keep_cutoff: float

    def doc_ppl(self, text: str) -> tuple[int, float]:
        lt = text.lower()
        n = len(lt) - 2
        if n <= 0:
            return 0, float("nan")
        den = self.total + self.vocab
        logs = 0.0
        for i in range(n):
            c = self.counts.get(lt[i : i + 3], 0)
            logs += np.log((c + 1) / den)
        return n, float(np.exp(-logs / n))


def freeze_lm(docs: DataFrame, keep_quantile: float = 2.0 / 3.0) -> FrozenTrigramLM:
    """Train the trigram LM on a corpus snapshot and freeze the keep
    cutoff at the snapshot's ``keep_quantile`` smoothed-ppl boundary.

    The rollup runs distributed (the same bounded-key trigram agg as
    the batch operator); only the vocabulary-scale count table and the
    doc-level ppl values are collected."""
    from pyspark.sql import functions as F

    tris = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, length(lower(text)) - 2), "
                "i -> substring(lower(text), i, 3))"
            )
        ).alias("tri"),
    ).where(F.length(F.lower("text")) >= 3)
    counts_df = tris.groupBy("tri").agg(F.count("*").alias("c"))
    rows = counts_df.collect()  # vocabulary scale (charset^3 bound)
    counts = {r.tri: r.c for r in rows}
    total = int(sum(counts.values()))
    vocab = len(counts)
    den = total + vocab
    # snapshot docs' SMOOTHED ppl (same formula the gate applies) —
    # one more keyed agg, then the cutoff is a driver-side quantile of
    # the doc-count-scale ppl vector
    ppl = (
        tris.join(F.broadcast(counts_df), "tri")
        .groupBy("doc_id")
        .agg(
            F.exp(
                -F.avg(F.log((F.col("c") + 1.0) / F.lit(float(den))))
            ).alias("ppl")
        )
    )
    vals = np.array([r.ppl for r in ppl.collect()])
    # frozen on the same 6dp grid the gate emits, so the keep
    # predicate (rounded ppl <= cutoff) has no sub-rounding knife edge
    cutoff = (
        round(float(np.quantile(vals, keep_quantile)), 6)
        if len(vals)
        else float("inf")
    )
    return FrozenTrigramLM(counts, total, vocab, cutoff)


def score_docs_batch(docs: DataFrame, lm: FrozenTrigramLM) -> DataFrame:
    """Batch twin of the streaming gate: identical mapInPandas scorer
    over a static frame (stream ≡ batch is pinned in pytest)."""
    return docs.select("doc_id", "text").mapInPandas(
        _scorer(lm), schema=OUT_SCHEMA
    )


def _scorer(lm: FrozenTrigramLM):
    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                n, ppl = lm.doc_ppl(text or "")
                if n == 0:
                    continue
                ppl = round(ppl, 6)
                out.append(
                    (int(doc_id), n, ppl, int(ppl <= lm.keep_cutoff))
                )
            yield pd.DataFrame(
                out, columns=["doc_id", "n_tris", "ppl", "keep"]
            )

    return score


def start_quality_gate(
    stream: DataFrame,
    lm: FrozenTrigramLM,
    checkpoint_dir: str,
    query_name: str = "quality_gate",
):
    """Wire the gate to a streaming source of (doc_id, text, ...) rows;
    emits (doc_id, n_tris, ppl, keep) in append mode to a memory sink
    (tests) — production swaps the sink for the versioned lake."""
    return (
        stream.select("doc_id", "text")
        .mapInPandas(_scorer(lm), schema=OUT_SCHEMA)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
