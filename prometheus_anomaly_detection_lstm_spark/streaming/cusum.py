"""Streaming two-sided CUSUM control chart: cross-microbatch state.

The batch operator (plans/robust.cusum_anomalies) computes the SPC
recursion S_t = max(0, S_{t-1} + z_t - K) closed-form over prefix
sums; the stream carries the SAME recursion's sufficient statistics
forward instead — per-series ``applyInPandasWithState`` holds
(c_pos, m_pos, c_neg, m_neg, n_seen) where c is the running sum of
(±z - K) and m its running minimum, so S = c - min(0, m) is exact
regardless of how the stream is micro-batched (batch-split invariance
and exact agreement with the batch operator are pinned in
tests/test_streaming_cusum.py).

Control parameters (per-series mu/sd) are FIT OFFLINE on a training
window — the standard SPC deployment (and the reference's: scaler +
threshold are trained artifacts applied in the realtime loop,
realtime_detector.py) — and enter the closure as a plain dict, so the
state function pickles to workers without the package.

Scale: state is four doubles + a long per series; parallelism is the
series-hash distribution, same as streaming/ewma.py.  In-order
arrival per series assumed (Prometheus scrape model).
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "metric string, ts timestamp, seq long, "
    "cusum_pos double, cusum_neg double, side string"
)
STATE_SCHEMA = (
    "c_pos double, m_pos double, c_neg double, m_neg double, n_seen long"
)

#: textbook SPC tuning, matching plans/robust.
CUSUM_K = 0.5
CUSUM_H = 5.0


def make_cusum_fn(
    params: dict[str, tuple[float, float]],
    k: float = CUSUM_K,
    h: float = CUSUM_H,
):
    """Build the applyInPandasWithState function.  ``params`` maps
    series -> (mu, sd) fitted offline; series without params (or with
    degenerate sd) pass through silently, mirroring the batch
    operator's sd > 0 filter."""

    def cusum(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        metric = key[0]
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values(["ts", "seq"], ignore_index=True)
        mu_sd = params.get(metric)
        if state.exists:
            c_pos, m_pos, c_neg, m_neg, n = state.get
        else:
            c_pos = m_pos = c_neg = m_neg = 0.0
            n = 0
        rows = []
        if mu_sd is not None and mu_sd[1] > 0:
            mu, sd = mu_sd
            for ts, seq, v in zip(pdf["ts"], pdf["seq"], pdf["value"]):
                z = (v - mu) / sd
                c_pos += z - k
                m_pos = min(m_pos, c_pos)
                c_neg += -z - k
                m_neg = min(m_neg, c_neg)
                s_pos = c_pos - min(0.0, m_pos)
                s_neg = c_neg - min(0.0, m_neg)
                if s_pos > h or s_neg > h:
                    rows.append(
                        (
                            metric,
                            ts,
                            seq,
                            round(s_pos, 6),
                            round(s_neg, 6),
                            "high" if s_pos > h else "low",
                        )
                    )
        state.update(
            (
                float(c_pos),
                float(m_pos),
                float(c_neg),
                float(m_neg),
                n + len(pdf),
            )
        )
        yield pd.DataFrame(
            rows,
            columns=["metric", "ts", "seq", "cusum_pos", "cusum_neg", "side"],
        )

    return cusum


def streaming_cusum(
    source: DataFrame,
    params: dict[str, tuple[float, float]],
    k: float = CUSUM_K,
    h: float = CUSUM_H,
) -> DataFrame:
    """Wire a streaming (ts, metric, value, seq) source through the
    per-series CUSUM state function; caller attaches sink/checkpoint."""
    return source.groupBy("metric").applyInPandasWithState(
        make_cusum_fn(params, k, h),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def fit_params(series: DataFrame) -> dict[str, tuple[float, float]]:
    """Offline mu/sd fit per series — the metadata-scale training
    artifact (one row per series) the streaming chart consumes."""
    from pyspark.sql import functions as F

    rows = (
        series.groupBy("metric")
        .agg(
            F.avg("value").alias("mu"),
            F.stddev_pop("value").alias("sd"),
        )
        .collect()
    )
    return {r["metric"]: (r["mu"], r["sd"]) for r in rows}
