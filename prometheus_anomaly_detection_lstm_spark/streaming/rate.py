"""Streaming PromQL counter rate: cross-microbatch lag state.

The batch operator (operators/promql.counter_rate) lags within a static
frame; in a stream, the delta between the LAST sample of one microbatch
and the FIRST sample of the next would be lost without state.  This is
the streaming twin: per-series ``applyInPandasWithState`` carries
(last_value, last_ts) across batches, so every consecutive-sample
increase is attributed exactly once no matter how the stream is
micro-batched — the conservation law the equivalence test pins
(sum of streamed per-batch increases == batch-mode total increase).

Reset semantics identical to the batch twin (and PromQL): a counter
that goes down restarted; the post-reset sample value IS its increase.

Scale: state is ONE (double, timestamp) pair per series — the minimum
possible; parallelism is the series-hash distribution, same as the
batch lag window.  Assumes in-order arrival per series within the
application's tolerance (the Prometheus scrape model); late samples
older than the carried last_ts are counted against the carried value,
matching a monotonic-scrape source.
"""

from __future__ import annotations

from typing import Any, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "metric string, n_samples long, n_resets long, "
    "batch_increase double, last_value double, last_ts timestamp"
)
STATE_SCHEMA = "last_value double, last_ts timestamp"


def make_rate_fn():
    """Build the applyInPandasWithState function (plain-value closure —
    pickles to workers without the package)."""

    def rate(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values(["ts", "seq"], ignore_index=True)
        v = pdf["value"].to_numpy(dtype=np.float64)
        carry = state.get[0] if state.exists else None
        if carry is None:
            prev = np.concatenate(([np.nan], v[:-1]))
        else:
            prev = np.concatenate(([carry], v[:-1]))
        inc = np.where(v >= prev, v - prev, v)  # reset: restart from 0
        valid = ~np.isnan(prev)
        state.update(
            (float(v[-1]), pdf["ts"].iloc[-1].to_pydatetime())
        )
        yield pd.DataFrame(
            {
                "metric": [key[0]],
                "n_samples": [len(v)],
                "n_resets": [int((v < prev).sum())],
                # None (SQL NULL), not np.nan: a batch holding only a
                # series' first-ever sample has no defined increase, and
                # NULL matches promql.counter_rate's batch semantics —
                # NaN would poison downstream SUMs and break the
                # cross-batch conservation law.
                "batch_increase": [
                    float(inc[valid].sum()) if valid.any() else None
                ],
                "last_value": [float(v[-1])],
                "last_ts": [pdf["ts"].iloc[-1]],
            }
        )

    return rate


def streaming_counter_rate(source: DataFrame) -> DataFrame:
    """Wire a streaming (ts, metric, value, seq) source through the
    per-series rate state function; caller attaches sink/checkpoint."""
    return source.groupBy("metric").applyInPandasWithState(
        make_rate_fn(),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
