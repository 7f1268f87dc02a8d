"""Distributed model inference over sequence windows (SURVEY §2.7-M5).

The reference scores with driver-side ``model.predict(sequences)``
(train_autoencoder.py:277, filter_anomalous_data.py:134).  At scale the
windows DataFrame never visits the driver: weights are broadcast once,
each executor rebuilds the scorer, and scoring runs inside an
Arrow-batched ``mapInPandas`` — per-window MSE (A6) and per-feature MSE
(A8) computed in NumPy per batch, no shuffle.

Works with any scorer exposing ``predict(x: (n, L, F)) -> (n, L, F)``;
the deterministic :class:`~..ml.autoencoder.StubAutoencoder` in tests,
a Keras LSTM in production (weights -> broadcast, rebuild per executor).
"""

from __future__ import annotations

from typing import Callable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

SCORE_SCHEMA = (
    "window_id bigint, start_ts timestamp, mse double, feature_mse array<double>"
)


def score_windows(
    windows: DataFrame,
    model_factory: Callable[[], object],
) -> DataFrame:
    """(window_id, start_ts, features) -> per-window MSE + per-feature MSE.

    ``model_factory`` must be picklable and cheap; it is invoked once
    per task (e.g. ``lambda: StubAutoencoder()`` or a closure that
    rebuilds Keras from broadcast weights).  The package is shipped to
    executors first — factories referencing package classes unpickle by
    module path on the Python worker.
    """
    from ..shipping import ensure_shipped

    ensure_shipped(windows.sparkSession)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        model = model_factory()
        for pdf in batches:
            if pdf.empty:
                continue
            x = np.array(
                [np.array([np.asarray(r) for r in w]) for w in pdf["features"]],
                dtype="float64",
            )
            recon = model.predict(x)
            err = x - recon
            sq = err * err
            yield pd.DataFrame(
                {
                    "window_id": pdf["window_id"],
                    "start_ts": pdf["start_ts"],
                    "mse": sq.mean(axis=(1, 2)),
                    "feature_mse": list(sq.mean(axis=1)),
                }
            )

    return windows.mapInPandas(run, SCORE_SCHEMA)
