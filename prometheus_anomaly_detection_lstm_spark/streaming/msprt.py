"""Streaming mSPRT: always-valid A/B monitoring with cross-microbatch
sufficient statistics.

The batch operator (plans/wave9.ab_sequential) computes the mixture-
SPRT p-value process per experiment DAY from cumulative per-variant
(n, sum, sumsq); the stream carries EXACTLY those sufficient
statistics forward in ``applyInPandasWithState`` — one state group per
experiment holding six numbers plus the running-min p — so the
always-valid envelope keeps its guarantee no matter how often the
stream peeks (that is the point of mSPRT: every micro-batch IS a peek,
and the p-value process is valid under continuous monitoring).

Emission: one row per experiment-day whose data advanced in the batch
(update semantics — a day spanning micro-batches re-emits with its
latest cumulative readout; the sink keeps the last row per day).  Fed
day-boundary-aligned batches, the rounded outputs equal the batch
operator row-for-row (pinned in tests/test_streaming_msprt.py, along
with split-invariance of the decision sequence).

Scale: state is 7 numbers per experiment; the per-row sequential fold
(deterministic (ts, seq) order, exact split invariance of the sums)
runs over PURCHASE events only — conversion-grade cadence, not raw
stream volume.  A hundred concurrent experiments are a hundred
7-number state groups.  Like the reference's realtime loop the stream
assumes in-order arrival per experiment (realtime_detector.py:163
refetches a step-aligned window every cycle rather than handling
out-of-order points).
"""

from __future__ import annotations

import math
from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..plans.wave9 import AB_ALPHA, AB_TAU2

OUTPUT_SCHEMA = (
    "experiment string, day timestamp, n0 long, n1 long, delta double, "
    "log_lr double, p_always_valid double, significant int"
)
STATE_SCHEMA = (
    "n0 long, s0 double, ss0 double, n1 long, s1 double, ss1 double, "
    "p_min double"
)


def make_msprt_fn(tau2: float = AB_TAU2, alpha: float = AB_ALPHA):
    """Build the applyInPandasWithState function: fold each purchase
    into the per-variant sufficient statistics in (ts, seq) order,
    score the mSPRT log-likelihood-ratio at every day boundary."""

    def msprt(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        experiment = key[0]
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values(["ts", "seq"], ignore_index=True)
        if state.exists:
            n0, s0, ss0, n1, s1, ss1, p_min = state.get
        else:
            n0, s0, ss0, n1, s1, ss1, p_min = 0, 0.0, 0.0, 0, 0.0, 0.0, 1.0
        out = []
        for day, grp in pdf.groupby(pdf["ts"].dt.floor("D"), sort=True):
            # per-ROW fold in deterministic order: the cumulative sums
            # are bit-identical no matter where micro-batch boundaries
            # fall (the split-invariance the cusum state carries too)
            for row in grp.itertuples(index=False):
                v = float(row.value)
                if int(row.user_id) % 2 == 0:
                    n0 += 1
                    s0 += v
                    ss0 += v * v
                else:
                    n1 += 1
                    s1 += v
                    ss1 += v * v
            if n0 < 2 or n1 < 2:
                continue
            delta = s1 / n1 - s0 / n0
            sp2 = (
                (ss0 - s0 * s0 / n0) + (ss1 - s1 * s1 / n1)
            ) / (n0 + n1 - 2)
            v_stat = sp2 * (1.0 / n0 + 1.0 / n1)
            if v_stat <= 0:
                continue
            log_lr = 0.5 * math.log(v_stat / (v_stat + tau2)) + (
                delta * delta * tau2
            ) / (2 * v_stat * (v_stat + tau2))
            p_min = min(p_min, min(1.0, math.exp(-log_lr)))
            out.append(
                (
                    experiment,
                    day.to_pydatetime(),
                    n0,
                    n1,
                    round(delta, 6),
                    round(log_lr, 6),
                    round(p_min, 6),
                    int(p_min < alpha),
                )
            )
        state.update((n0, s0, ss0, n1, s1, ss1, p_min))
        yield pd.DataFrame(
            out,
            columns=[
                "experiment", "day", "n0", "n1", "delta", "log_lr",
                "p_always_valid", "significant",
            ],
        )

    return msprt


def streaming_msprt(
    stream: DataFrame,
    tau2: float = AB_TAU2,
    alpha: float = AB_ALPHA,
) -> DataFrame:
    """Wire a streaming events source (ts, user_id, event_type, value,
    event_id) into the stateful mSPRT monitor."""
    purchases = stream.filter(F.col("event_type") == "purchase").select(
        F.lit("ab").alias("experiment"),
        "ts",
        F.col("event_id").alias("seq"),
        "user_id",
        "value",
    )
    return purchases.groupBy("experiment").applyInPandasWithState(
        make_msprt_fn(tau2, alpha),
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
