"""Bridge existing reference artifacts (.keras model / sklearn scaler)
into this engine's formats.

TensorFlow and joblib are absent from the engine's runtime — by design:
inference and training are pure NumPy (ml/lstm_np.py, ml/lstm_train.py).
A user migrating from the reference runs the conversion ONCE in their
own training environment (where TF/sklearn already live):

    python -m prometheus_anomaly_detection_lstm_spark.ml.keras_bridge \\
        model.keras weights.npz            # Keras -> npz weights
    python -m prometheus_anomaly_detection_lstm_spark.ml.keras_bridge \\
        --scaler scaler.joblib params.csv  # sklearn -> params table

The layout mapping itself (``keras_weights_to_layout``) is pure NumPy
and fully tested here; only the artifact *loading* needs the user's
libraries and is import-gated with clear guidance.
"""

from __future__ import annotations

import sys

import numpy as np

#: our npz key layout, in Keras ``model.get_weights()`` order for the
#: reference architecture (train_autoencoder.py:76-91): four LSTM
#: layers (kernel, recurrent_kernel, bias each) then the TimeDistributed
#: Dense (kernel, bias).
_LAYER_ORDER = ("enc1", "enc2", "dec1", "dec2")


def keras_weights_to_layout(arrays: list[np.ndarray]) -> dict[str, np.ndarray]:
    """``model.get_weights()`` list -> the ml/lstm_np npz key layout.

    Validates the shape chain (each LSTM kernel is (input_dim, 4*units),
    recurrent (units, 4*units), bias (4*units,)) so a wrong-architecture
    model fails loudly instead of mis-keying.
    """
    if len(arrays) != 3 * len(_LAYER_ORDER) + 2:
        raise ValueError(
            f"expected {3 * len(_LAYER_ORDER) + 2} weight arrays "
            f"(4 LSTM layers x 3 + Dense x 2), got {len(arrays)}"
        )
    out: dict[str, np.ndarray] = {}
    prev_units: int | None = None
    for li, name in enumerate(_LAYER_ORDER):
        W, U, b = arrays[3 * li : 3 * li + 3]
        units = U.shape[0]
        if U.shape != (units, 4 * units) or W.shape[1] != 4 * units:
            raise ValueError(f"{name}: kernel shapes {W.shape}/{U.shape} "
                             "are not a fused-gate LSTM layer")
        if b.shape != (4 * units,):
            raise ValueError(f"{name}: bias shape {b.shape} != (4*units,)")
        if prev_units is not None and W.shape[0] != prev_units:
            raise ValueError(
                f"{name}: input dim {W.shape[0]} does not chain from "
                f"previous layer's {prev_units} units"
            )
        out[f"{name}_W"] = np.asarray(W, dtype="float64")
        out[f"{name}_U"] = np.asarray(U, dtype="float64")
        out[f"{name}_b"] = np.asarray(b, dtype="float64")
        prev_units = units
    Wd, bd = arrays[-2:]
    if Wd.shape[0] != prev_units or bd.shape != (Wd.shape[1],):
        raise ValueError(f"dense shapes {Wd.shape}/{bd.shape} do not chain")
    out["dense_W"] = np.asarray(Wd, dtype="float64")
    out["dense_b"] = np.asarray(bd, dtype="float64")
    return out


def sklearn_minmax_to_params(
    feature_names: list[str],
    data_min: np.ndarray,
    data_max: np.ndarray,
    mean: np.ndarray | None = None,
    std_pop: np.ndarray | None = None,
) -> list[dict]:
    """sklearn ``MinMaxScaler`` attributes -> the params-table rows the
    engine's scale operators consume (operators/scale.fit_params schema:
    feature, min, max, mean, std_pop)."""
    n = len(feature_names)
    mean = mean if mean is not None else np.full(n, np.nan)
    std_pop = std_pop if std_pop is not None else np.full(n, np.nan)
    return [
        {
            "feature": f,
            "min": float(data_min[i]),
            "max": float(data_max[i]),
            "mean": float(mean[i]),
            "std_pop": float(std_pop[i]),
        }
        for i, f in enumerate(feature_names)
    ]


def _export_keras(model_path: str, out_path: str) -> None:  # pragma: no cover
    try:
        from tensorflow import keras
    except ImportError as exc:
        raise SystemExit(
            "TensorFlow is required to READ .keras/.h5 artifacts — run "
            "this command in the environment where the model was trained."
        ) from exc
    model = keras.models.load_model(model_path)
    layout = keras_weights_to_layout(
        [np.asarray(a) for a in model.get_weights()]
    )
    np.savez(out_path, **layout)
    print(f"wrote {out_path} ({len(layout)} arrays)")


def _export_scaler(scaler_path: str, out_path: str) -> None:  # pragma: no cover
    try:
        import joblib
    except ImportError as exc:
        raise SystemExit(
            "joblib is required to READ sklearn scaler artifacts — run "
            "this command in the environment where the scaler was fitted."
        ) from exc
    scaler = joblib.load(scaler_path)
    names = [f"f{i}" for i in range(len(scaler.data_min_))]
    rows = sklearn_minmax_to_params(names, scaler.data_min_, scaler.data_max_)
    import csv

    with open(out_path, "w", newline="") as fh:
        writer = csv.DictWriter(
            fh, fieldnames=["feature", "min", "max", "mean", "std_pop"]
        )
        writer.writeheader()
        writer.writerows(rows)
    print(f"wrote {out_path} ({len(rows)} features)")


if __name__ == "__main__":  # pragma: no cover
    args = [a for a in sys.argv[1:]]
    if args and args[0] == "--scaler":
        _export_scaler(args[1], args[2])
    elif len(args) == 2:
        _export_keras(args[0], args[1])
    else:
        raise SystemExit(__doc__)
