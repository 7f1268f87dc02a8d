"""Keras/sklearn artifact bridge: layout mapping (pure NumPy, no TF)."""

from __future__ import annotations

import numpy as np
import pytest

from prometheus_anomaly_detection_lstm_spark.ml.keras_bridge import (
    keras_weights_to_layout,
    sklearn_minmax_to_params,
)
from prometheus_anomaly_detection_lstm_spark.ml.lstm_np import LSTMAutoencoder


def _fake_get_weights(num_features=7, units=(64, 32)):
    """Arrays in Keras get_weights() order for the reference stack."""
    e1, e2 = units
    rng = np.random.default_rng(4)
    dims = [(num_features, e1), (e1, e2), (e2, e2), (e2, e1)]
    arrays = []
    for d_in, u in dims:
        arrays += [
            rng.standard_normal((d_in, 4 * u)),
            rng.standard_normal((u, 4 * u)),
            rng.standard_normal(4 * u),
        ]
    arrays += [rng.standard_normal((e1, num_features)),
               rng.standard_normal(num_features)]
    return arrays


def test_layout_roundtrip_scores():
    layout = keras_weights_to_layout(_fake_get_weights())
    assert set(layout) == {
        f"{n}_{s}" for n in ("enc1", "enc2", "dec1", "dec2")
        for s in ("W", "U", "b")
    } | {"dense_W", "dense_b"}
    model = LSTMAutoencoder(layout)
    x = np.random.default_rng(1).uniform(0, 1, (3, 20, 7))
    y = model.predict(x)
    assert y.shape == x.shape and 0.0 <= y.min() and y.max() <= 1.0


def test_layout_rejects_wrong_architecture():
    arrays = _fake_get_weights()
    with pytest.raises(ValueError, match="weight arrays"):
        keras_weights_to_layout(arrays[:-1])
    bad = list(arrays)
    bad[1] = bad[1][:, :-4]  # break the fused-gate recurrent shape
    with pytest.raises(ValueError, match="LSTM layer"):
        keras_weights_to_layout(bad)


def test_sklearn_params_rows():
    rows = sklearn_minmax_to_params(
        ["m1", "m2"], np.array([0.0, 1.0]), np.array([2.0, 5.0])
    )
    assert rows[0] == {
        "feature": "m1", "min": 0.0, "max": 2.0,
        "mean": pytest.approx(float("nan"), nan_ok=True),
        "std_pop": pytest.approx(float("nan"), nan_ok=True),
    }
    assert rows[1]["max"] == 5.0
