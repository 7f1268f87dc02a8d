"""Streaming per-series EWMA: cross-microbatch level state.

The batch operator (operators/promql.metric_ewma) folds a K-term
truncated window per row; a stream carries the level forward instead —
per-series ``applyInPandasWithState`` holds (ewma, n_seen), each
microbatch folds its samples in (ts, seq) order seeded from the carried
level, so the recursion w_i = (1-a)·w_{i-1} + a·x_i is applied exactly
once per sample regardless of how the stream is micro-batched
(batch-split invariance pinned in tests/test_streaming_ewma.py).

The streaming value is the UNTRUNCATED recursion; the batch twin
truncates at K where (1-a)^K ~ 5e-10, so after K samples of warmup the
two agree to well below the 6-decimal output rounding — the
equivalence test asserts exactly that window.

Scale: state is one (double, long) per series; parallelism is the
series-hash distribution, same as the batch window and the streaming
rate operator.  In-order arrival per series assumed (Prometheus scrape
model), matching streaming/rate.py.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "metric string, ts timestamp, seq long, value double, ewma double"
)
STATE_SCHEMA = "ewma double, n_seen long"


def make_ewma_fn(alpha: float = 0.3):
    """Build the applyInPandasWithState function (plain-value closure —
    pickles to workers without the package)."""

    def ewma(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values(["ts", "seq"], ignore_index=True)
        v = pdf["value"].to_list()
        if state.exists:
            level, n = state.get
        else:
            level, n = None, 0
        out = []
        for x in v:
            level = x if level is None else level * (1 - alpha) + alpha * x
            out.append(round(level, 6))
        state.update((float(level), n + len(v)))
        yield pd.DataFrame(
            {
                "metric": [key[0]] * len(v),
                "ts": pdf["ts"],
                "seq": pdf["seq"],
                "value": pdf["value"],
                "ewma": out,
            }
        )

    return ewma


def streaming_ewma(source: DataFrame, alpha: float = 0.3) -> DataFrame:
    """Wire a streaming (ts, metric, value, seq) source through the
    per-series EWMA state function; caller attaches sink/checkpoint."""
    return source.groupBy("metric").applyInPandasWithState(
        make_ewma_fn(alpha),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
