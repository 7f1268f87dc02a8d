"""CLI train -> filter end-to-end: trained LSTM weights + matching
threshold artifacts, consumed by the filter stage (M4 + S9/S10/S14)."""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pytest

from prometheus_anomaly_detection_lstm_spark.cli import cmd_filter, cmd_train
from prometheus_anomaly_detection_lstm_spark.config import EngineConfig


@pytest.fixture()
def processed(spark, tmp_path):
    ts = pd.date_range("2024-01-01", periods=60, freq="2min")
    rng = np.random.default_rng(9)
    pdf = pd.DataFrame(
        {
            "ts": ts,
            "m1": rng.uniform(0, 1, 60),
            "m2": rng.uniform(0, 1, 60),
        }
    )
    path = str(tmp_path / "processed.parquet")
    spark.createDataFrame(pdf).write.parquet(path)
    return path


def _cfg(tmp_path, model_type):
    return EngineConfig(
        artifacts_dir=str(tmp_path / "artifacts"),
        sequence_length=5,
        epochs=3,
        early_stopping_patience=3,
        model_type=model_type,
    )


@pytest.mark.parametrize("model_type", ["lstm", "linear"])
def test_train_then_filter(spark, tmp_path, processed, model_type):
    cfg = _cfg(tmp_path, model_type)
    cmd_train(cfg, input_path=processed)

    weights = os.path.join(cfg.artifacts_dir, "autoencoder_weights.npz")
    meta = os.path.join(cfg.artifacts_dir, "training_meta.json")
    assert os.path.exists(weights) and os.path.exists(meta)
    with np.load(weights) as npz:
        keys = set(npz.files)
    if model_type == "lstm":
        assert "enc1_W" in keys and "dense_W" in keys
    else:
        assert keys == {"a", "b"}
    with open(meta) as fh:
        m = json.load(fh)
    assert m["threshold"] > 0 and len(m["history"]) >= 1

    cmd_filter(cfg, input_path=processed)
    normal = spark.read.parquet(
        os.path.join(cfg.artifacts_dir, "normal_sequences.parquet")
    )
    anom = spark.read.parquet(
        os.path.join(cfg.artifacts_dir, "anomalous_sequences.parquet")
    )
    # every full window lands in exactly one split
    assert normal.count() + anom.count() == 60 - 5 + 1
    # threshold = p95 of val errors scored with the TRAINED model ->
    # the filter (same model, same data superset) flags a minority
    assert anom.count() < normal.count()
