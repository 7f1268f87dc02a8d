"""Streaming absent-series detection: the "target disappeared" alert.

Batch ``operators/promql.absent_buckets`` finds historical gaps; a live
monitor needs the STREAMING question — which series have stopped
reporting? — answered without polling every series every cycle.  This
operator holds one (last_seen) per series in ``applyInPandasWithState``
and arms an EVENT-TIME timeout ``gap_s`` past each sample: when the
stream's watermark passes that deadline with no new sample, Spark
invokes the function with ``state.hasTimedOut`` and the operator emits
ONE absent row (series, last_seen, deadline missed).  A series that
resumes re-arms from its new samples — the Alertmanager
``absent()``-alert lifecycle.

Scale: state is one timestamp per series; timeouts are managed by the
engine against the watermark (no scan over state per microbatch from
user code).  Parallelism = series-hash distribution, like the rate and
EWMA state operators.  Requires ``withWatermark`` on the source — the
watermark IS the clock that fires detections.
"""

from __future__ import annotations

import datetime as dt
from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "metric string, last_seen timestamp, deadline timestamp"
STATE_SCHEMA = "last_seen timestamp"


def make_absent_fn(gap_s: int = 600):
    """Build the applyInPandasWithState function (plain-value closure —
    pickles to workers without the package)."""

    def absent(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            (last_seen,) = state.get
            state.remove()  # re-arms if the series ever resumes
            yield pd.DataFrame(
                {
                    "metric": [key[0]],
                    "last_seen": [last_seen],
                    "deadline": [last_seen + dt.timedelta(seconds=gap_s)],
                }
            )
            return
        pdf = pd.concat(list(pdfs), ignore_index=True)
        last = pdf["ts"].max()
        if state.exists:
            (prev,) = state.get
            if prev is not None and prev > last:
                last = prev
        state.update((last.to_pydatetime(),))
        state.setTimeoutTimestamp(
            int(last.timestamp() * 1000) + gap_s * 1000
        )
        yield pd.DataFrame(
            {"metric": [], "last_seen": [], "deadline": []}
        ).astype(
            {
                "metric": object,
                "last_seen": "datetime64[us]",
                "deadline": "datetime64[us]",
            }
        )

    return absent


def streaming_absent(
    source: DataFrame, gap_s: int = 600, watermark_delay: str = "1 minute"
) -> DataFrame:
    """Wire a streaming (ts, metric, ...) source through absent-series
    detection; caller attaches sink/checkpoint.  Emits one row per
    detected silence (series, last_seen, missed deadline)."""
    return (
        source.withWatermark("ts", watermark_delay)
        .groupBy("metric")
        .applyInPandasWithState(
            make_absent_fn(gap_s),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
