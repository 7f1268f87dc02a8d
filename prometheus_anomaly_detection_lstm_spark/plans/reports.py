"""Driver-side report sinks (SURVEY §2.1-S13).

The reference renders a training-loss curve and a 50-bin density
histogram with matplotlib (train_autoencoder.py:254-292).  Here the
heavy part — the histogram — is computed IN SPARK (operators/score.py
``mse_histogram``: two scans, counts per bucket) and only the tiny
bucket table reaches the driver; rendering is gated on matplotlib,
which this image lacks, so the data path stays fully testable and the
PNG step degrades to a clear error.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def histogram_density(hist_df: DataFrame, bins: int = 50) -> list[dict]:
    """Spark bucket counts -> density values (matplotlib `density=True`
    semantics: count / (total * bin_width) — width normalization happens
    at render time with the known bounds)."""
    rows = {r["bucket"]: r["n"] for r in hist_df.collect()}
    total = sum(rows.values()) or 1
    return [
        {"bucket": b, "count": rows.get(b, 0), "frac": rows.get(b, 0) / total}
        for b in range(bins)
    ]


def save_histogram_png(
    hist_df: DataFrame, path: str, bins: int = 50
) -> None:  # pragma: no cover - matplotlib absent in CI image
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError as exc:
        raise NotImplementedError(
            "matplotlib is not installed in this environment; use "
            "histogram_density() for the data and render elsewhere"
        ) from exc
    dens = histogram_density(hist_df, bins)
    plt.figure(figsize=(8, 4))
    plt.bar([d["bucket"] for d in dens], [d["frac"] for d in dens])
    plt.xlabel("error bucket")
    plt.ylabel("fraction")
    plt.savefig(path)
    plt.close()


def save_loss_curve_png(history: list[float], path: str) -> None:
    # pragma: no cover - matplotlib absent in CI image
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError as exc:
        raise NotImplementedError(
            "matplotlib is not installed; training history is persisted "
            "in training_meta.json for external rendering"
        ) from exc
    plt.figure(figsize=(8, 4))
    plt.plot(history)
    plt.xlabel("epoch")
    plt.ylabel("val_loss")
    plt.savefig(path)
    plt.close()
