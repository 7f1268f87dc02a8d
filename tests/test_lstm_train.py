"""LSTM BPTT training: gradient check, convergence, determinism."""

from __future__ import annotations

import numpy as np
import pytest

from prometheus_anomaly_detection_lstm_spark.ml.lstm_np import init_weights
from prometheus_anomaly_detection_lstm_spark.ml.lstm_train import (
    forward_with_caches,
    loss_and_grads,
    train_lstm_autoencoder,
)


def _numerical_grad(weights, x, key, idx, eps=1e-6):
    w = weights[key]
    orig = w.flat[idx]
    w.flat[idx] = orig + eps
    y_plus, _ = forward_with_caches(weights, x)
    lp = float(((y_plus - x) ** 2).mean())
    w.flat[idx] = orig - eps
    y_minus, _ = forward_with_caches(weights, x)
    lm = float(((y_minus - x) ** 2).mean())
    w.flat[idx] = orig
    return (lp - lm) / (2 * eps)


def test_analytical_gradients_match_numerical():
    rng = np.random.default_rng(42)
    x = rng.uniform(0.05, 0.95, (2, 3, 2))
    weights = init_weights(2, units=(3, 2), seed=7)
    # nonzero biases so every gate path carries gradient
    for k in weights:
        if k.endswith("_b"):
            weights[k] = rng.standard_normal(weights[k].shape) * 0.1
    _, grads = loss_and_grads(weights, x)
    for key in sorted(weights):
        flat = grads[key].ravel()
        # sample a handful of indices per tensor
        for idx in rng.choice(flat.size, size=min(5, flat.size), replace=False):
            num = _numerical_grad(weights, x, key, int(idx))
            ana = float(flat[int(idx)])
            assert ana == pytest.approx(num, rel=1e-4, abs=1e-9), (
                f"{key}[{idx}]: analytical={ana} numerical={num}"
            )


def test_training_reduces_loss_and_is_deterministic():
    rng = np.random.default_rng(1)
    # learnable structure: two repeating window patterns
    base = rng.uniform(0.2, 0.8, (2, 6, 3))
    x = np.concatenate([base + rng.normal(0, 0.01, base.shape)
                        for _ in range(8)])
    model1, hist1 = train_lstm_autoencoder(
        x, epochs=60, lr=0.02, patience=60, units=(6, 3)
    )
    model2, hist2 = train_lstm_autoencoder(
        x, epochs=60, lr=0.02, patience=60, units=(6, 3)
    )
    assert hist1[-1] < hist1[0] * 0.8  # loss dropped >20%
    assert hist1 == hist2  # bit-deterministic
    for k in model1.w:
        np.testing.assert_array_equal(model1.w[k], model2.w[k])
    # trained model scores windows through the standard predict protocol
    recon = model1.predict(x[:4])
    assert recon.shape == x[:4].shape
    assert float(((recon - x[:4]) ** 2).mean()) == pytest.approx(
        hist1[-1], rel=0.5
    )


def test_early_stopping_restores_best():
    rng = np.random.default_rng(3)
    x = rng.uniform(0.1, 0.9, (6, 4, 2))
    # aggressive lr -> loss oscillates -> early stop restores the best
    model, hist = train_lstm_autoencoder(
        x, epochs=40, lr=0.5, patience=3, units=(3, 2)
    )
    y, _ = forward_with_caches(model.w, x)
    final = float(((y - x) ** 2).mean())
    assert final == pytest.approx(min(hist), abs=1e-12)


def test_distributed_training_matches_driver(spark):
    """Per-partition gradients + driver Adam == driver-side full-batch
    training on the fixture (float summation order is the only
    divergence; the histories and weights pin together tightly)."""
    from prometheus_anomaly_detection_lstm_spark.ml.lstm_train import (
        train_lstm_autoencoder_distributed,
    )

    rng = np.random.default_rng(11)
    base = rng.uniform(0.2, 0.8, (2, 5, 3))
    x = np.concatenate(
        [base + rng.normal(0, 0.01, base.shape) for _ in range(6)]
    )
    driver_model, driver_hist = train_lstm_autoencoder(
        x, epochs=8, lr=0.02, patience=8, units=(4, 2)
    )
    rows = [(int(i), [list(map(float, step)) for step in w])
            for i, w in enumerate(x)]
    windows = spark.createDataFrame(
        rows, "window_id bigint, features array<array<double>>"
    ).repartition(4)
    dist_model, dist_hist = train_lstm_autoencoder_distributed(
        windows, epochs=8, lr=0.02, patience=8, units=(4, 2)
    )
    assert len(driver_hist) == len(dist_hist)
    np.testing.assert_allclose(driver_hist, dist_hist, rtol=1e-9)
    for k in driver_model.w:
        np.testing.assert_allclose(
            dist_model.w[k], driver_model.w[k], rtol=1e-7, atol=1e-10
        )
