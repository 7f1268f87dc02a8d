"""Streaming last-touch attribution: cross-microbatch touch state.

The batch operator (plans/wave5.last_touch_attribution) carries the
last non-purchase event forward inside one window frame; in a stream,
a purchase landing in a later microbatch than its touch would fall
back to 'direct' without state.  This is the streaming twin: per-user
``applyInPandasWithState`` carries (touch_type, touch_epoch) across
batches, so every purchase is credited to the same channel the batch
operator would pick no matter how the stream is micro-batched — the
equivalence the test pins.

Scale: state is ONE (string, double) pair per user — minimal;
parallelism is the user-hash distribution, same as the batch window's
exchange.  Output is one row per purchase (append mode), so downstream
channel rollups are ordinary streaming aggregations.
"""

from __future__ import annotations

from typing import Any, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, event_id long, channel string, value double, "
    "latency_s double"
)
STATE_SCHEMA = "touch_type string, touch_epoch double"


def make_attribution_fn():
    """Build the applyInPandasWithState function (plain-value closure —
    pickles to workers without the package)."""

    def attribute(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values(["ts", "event_id"], ignore_index=True)
        # pin the unit before the int view: pandas may hand us ns or us
        e = pdf["ts"].astype("datetime64[ns]").astype("int64").to_numpy() / 1e9
        is_touch = (pdf["event_type"] != "purchase").to_numpy()

        # last touch STRICTLY before each row: own-row values shifted
        # down one, then forward-filled; leading gap comes from state.
        tt = pd.Series(np.where(is_touch, pdf["event_type"], None))
        te = pd.Series(np.where(is_touch, e, np.nan))
        prev_type = tt.shift(1).ffill()
        prev_e = te.shift(1).ffill()
        if state.exists:
            carry_type, carry_e = state.get
            prev_type = prev_type.fillna(carry_type)
            prev_e = prev_e.fillna(carry_e)

        mask = ~is_touch
        lat = e[mask] - prev_e[mask].to_numpy(dtype=np.float64)
        # SQL NULL (not NaN) for direct purchases, matching the batch
        # twin — NaN would poison downstream channel averages.
        lat_arr = pd.array(lat, dtype="Float64")
        lat_arr[np.isnan(lat)] = pd.NA
        # value gets the same masked-Float64 treatment as latency_s: a
        # purchase with NULL value must stay SQL NULL, not become NaN
        # (astype('float64') maps None -> NaN, which poisons averages).
        raw_value = pdf.loc[mask, "value"]
        val_arr = pd.array(
            raw_value.astype("float64").values, dtype="Float64"
        )
        val_arr[raw_value.isna().to_numpy()] = pd.NA
        out = pd.DataFrame(
            {
                "user_id": pdf.loc[mask, "user_id"].astype("int64").values,
                "event_id": pdf.loc[mask, "event_id"].astype("int64").values,
                "channel": prev_type[mask].fillna("direct").values,
                "value": val_arr,
                "latency_s": lat_arr,
            }
        )

        if is_touch.any():
            last = np.flatnonzero(is_touch)[-1]
            state.update(
                (str(pdf["event_type"].iloc[last]), float(e[last]))
            )
        # else: keep the carried touch as-is
        yield out

    return attribute


def streaming_attribution(source: DataFrame) -> DataFrame:
    """Wire a streaming (ts, event_id, user_id, event_type, value)
    source through the per-user touch state; caller attaches
    sink/checkpoint."""
    return source.groupBy("user_id").applyInPandasWithState(
        make_attribution_fn(),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
