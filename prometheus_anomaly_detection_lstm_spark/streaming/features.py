"""Streaming point-in-time features: bounded trailing-horizon state.

The batch operator (plans/wave5.pointintime_features) computes each
purchase's trailing-7-day snapshot with a RANGE frame; in a stream the
frame spans microbatch boundaries, so the operator carries each user's
in-horizon events as state.  State is BOUNDED by construction: after
every batch it is pruned to the horizon behind the newest event seen,
so a user's state holds at most their 7 days of activity — never full
history (the property that makes this run forever at 100-TB ingest).

Emits one snapshot row per purchase (append mode), identical to the
batch operator's output no matter how the stream is micro-batched —
the equivalence the test pins, including a purchase whose horizon
spans three batches.

Assumes per-user in-order arrival within the application's tolerance
(same contract as the other stateful twins here); a late event older
than an already-emitted purchase cannot retroactively amend that
snapshot (the batch operator re-run over the full log is the repair
path, the standard lambda split).
"""

from __future__ import annotations

from typing import Any, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

HORIZON = 604800  # seconds, = plans/wave5.PIT_HORIZON

OUTPUT_SCHEMA = (
    "user_id long, event_id long, n_clicks_7d long, n_views_7d long, "
    "n_errors_7d long, spend_7d double"
)
#: carried in-horizon events, parallel arrays (epoch asc)
STATE_SCHEMA = (
    "epochs array<double>, types array<string>, values array<double>"
)


def make_features_fn(horizon: int = HORIZON):
    """Build the applyInPandasWithState function (plain-value closure —
    pickles to workers without the package)."""

    def snapshot(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values(["ts", "event_id"], ignore_index=True)
        e = pdf["ts"].astype("datetime64[ns]").astype("int64").to_numpy() / 1e9

        if state.exists:
            se, st, sv = state.get
            hist_e = np.array(list(se) + list(e), dtype=np.float64)
            hist_t = list(st) + list(pdf["event_type"])
            hist_v = np.array(
                list(sv) + list(pdf["value"].fillna(0.0)), dtype=np.float64
            )
        else:
            hist_e = e.astype(np.float64)
            hist_t = list(pdf["event_type"])
            hist_v = pdf["value"].fillna(0.0).to_numpy(dtype=np.float64)
        n_old = len(hist_e) - len(e)

        t_arr = np.array(hist_t)
        # INTEGER-second frame, exactly the batch twin's RANGE
        # [-horizon, -1] over epoch seconds cast to long: every event in
        # the purchase's own second is excluded regardless of sub-second
        # order, so the selection needs no positional guard.
        hist_int = np.floor(hist_e).astype(np.int64)
        out_rows = []
        for i in range(len(e)):
            j = n_old + i
            if t_arr[j] != "purchase":
                continue
            ei = int(hist_int[j])
            sel = (hist_int >= ei - horizon) & (hist_int <= ei - 1)
            win_t = t_arr[sel]
            win_v = hist_v[sel]
            out_rows.append(
                {
                    "user_id": int(key[0]),
                    "event_id": int(pdf["event_id"].iloc[i]),
                    "n_clicks_7d": int((win_t == "click").sum()),
                    "n_views_7d": int((win_t == "view").sum()),
                    "n_errors_7d": int((win_t == "error").sum()),
                    "spend_7d": round(
                        float(win_v[win_t == "purchase"].sum()), 2
                    ),
                }
            )

        # prune: keep only events whose INTEGER second can still fall in
        # a future purchase's frame (future ei >= floor(newest)) —
        # state stays O(activity-in-horizon)
        keep = hist_int >= int(hist_int[-1]) - horizon
        state.update(
            (
                [float(x) for x in hist_e[keep]],
                [hist_t[i] for i in np.flatnonzero(keep)],
                [float(x) for x in hist_v[keep]],
            )
        )
        yield pd.DataFrame(
            out_rows,
            columns=[
                "user_id", "event_id", "n_clicks_7d", "n_views_7d",
                "n_errors_7d", "spend_7d",
            ],
        )

    return snapshot


def streaming_pointintime_features(source: DataFrame) -> DataFrame:
    """Wire a streaming (ts, event_id, user_id, event_type, value)
    source through the per-user snapshot state; caller attaches
    sink/checkpoint."""
    return source.groupBy("user_id").applyInPandasWithState(
        make_features_fn(),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
