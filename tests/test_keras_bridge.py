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


def _keras_zip_bytes(arrays, layer_names=("lstm", "lstm_1", "lstm_2", "lstm_3")):
    """Build a synthetic Keras v3 .keras archive: config.json + a
    spec-compliant model.weights.h5 (tests/h5_writer.py) mirroring the
    checkpoint tree Keras writes (layers/<name>/vars/<i>)."""
    import io
    import json
    import zipfile

    from .h5_writer import write_h5

    layers_tree = {}
    for li, name in enumerate(layer_names):
        layers_tree[name] = {
            "vars": {str(i): arrays[3 * li + i] for i in range(3)}
        }
    layers_tree["time_distributed"] = {
        "layer": {"vars": {"0": arrays[-2], "1": arrays[-1]}}
    }
    h5 = write_h5({"layers": layers_tree})

    config = {
        "class_name": "Sequential",
        "config": {
            "name": "sequential",
            "layers": [
                *[
                    {"class_name": "LSTM", "config": {"name": n}}
                    for n in layer_names
                ],
                {
                    "class_name": "TimeDistributed",
                    "config": {
                        "name": "time_distributed",
                        "layer": {
                            "class_name": "Dense",
                            "config": {"name": "dense"},
                        },
                    },
                },
            ],
        },
    }
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("config.json", json.dumps(config))
        zf.writestr("metadata.json", json.dumps({"keras_version": "3.x"}))
        zf.writestr("model.weights.h5", h5)
    return buf.getvalue()


def test_h5lite_reads_spec_compliant_file():
    """The pure-NumPy HDF5 reader parses a file written against the
    public spec (v0 superblock, symbol-table groups, contiguous LE
    datasets) — values, dtypes, shapes, nested paths."""
    from prometheus_anomaly_detection_lstm_spark.ml.h5lite import read_datasets

    from .h5_writer import write_h5

    rng = np.random.default_rng(7)
    a = rng.standard_normal((3, 5))
    b = rng.standard_normal(4).astype("float32")
    c = np.arange(6, dtype="int64").reshape(2, 3)
    data = write_h5({"g1": {"x": a, "sub": {"y": b}}, "z": c})
    out = read_datasets(data)
    assert set(out) == {"/g1/x", "/g1/sub/y", "/z"}
    np.testing.assert_array_equal(out["/g1/x"], a)
    np.testing.assert_array_equal(out["/g1/sub/y"], b)
    np.testing.assert_array_equal(out["/z"], c)
    assert out["/g1/sub/y"].dtype == np.float32
    assert out["/z"].dtype == np.int64


def test_load_keras_archive_matches_bridge_path(tmp_path):
    """A synthetic .keras zip loads in one step (no TF) into the same
    layout — and the same scores — as the get_weights() bridge path."""
    from prometheus_anomaly_detection_lstm_spark.ml.keras_bridge import (
        load_keras_archive,
    )

    arrays = [a.astype("float32") for a in _fake_get_weights()]
    path = tmp_path / "model.keras"
    path.write_bytes(_keras_zip_bytes(arrays))

    direct = load_keras_archive(str(path))
    bridge = keras_weights_to_layout(arrays)
    assert set(direct) == set(bridge)
    for k in bridge:
        np.testing.assert_array_equal(direct[k], bridge[k])

    x = np.random.default_rng(2).uniform(0, 1, (2, 20, 7))
    np.testing.assert_allclose(
        LSTMAutoencoder(direct).predict(x),
        LSTMAutoencoder(bridge).predict(x),
        rtol=0,
        atol=0,
    )


def test_load_keras_archive_rejects_wrong_architecture(tmp_path):
    from prometheus_anomaly_detection_lstm_spark.ml.keras_bridge import (
        load_keras_archive,
    )

    arrays = _fake_get_weights()
    arrays[1] = arrays[1][:, :-4]  # break the fused-gate shape
    path = tmp_path / "bad.keras"
    path.write_bytes(_keras_zip_bytes(arrays))
    with pytest.raises(ValueError, match="LSTM layer"):
        load_keras_archive(str(path))
