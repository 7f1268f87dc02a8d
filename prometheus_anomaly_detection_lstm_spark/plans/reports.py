"""Driver-side report sinks (SURVEY §2.1-S13).

The reference renders a training-loss curve and a 50-bin density
histogram with matplotlib (train_autoencoder.py:254-292).  Here the
heavy part — the histogram — is computed IN SPARK (operators/score.py
``mse_histogram``: two scans, counts per bucket) and only the tiny
bucket table reaches the driver.  Rendering prefers matplotlib when
installed (axis labels, ticks) and otherwise falls back to the
pure-stdlib PNG rasterizer in ``plans/png.py`` — either way a real PNG
file is produced, closing the reference's plot-sink surface without
new dependencies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from . import png as _png


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


def _try_matplotlib():
    try:  # pragma: no cover - matplotlib absent in CI image
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        return plt
    except ImportError:
        return None


def save_histogram_png(hist_df: DataFrame, path: str, bins: int = 50) -> None:
    """train_autoencoder.py:280-292: 50-bin error histogram -> PNG file."""
    dens = histogram_density(hist_df, bins)
    plt = _try_matplotlib()
    if plt is not None:  # pragma: no cover - matplotlib absent in CI image
        plt.figure(figsize=(8, 4))
        plt.bar([d["bucket"] for d in dens], [d["frac"] for d in dens])
        plt.xlabel("error bucket")
        plt.ylabel("fraction")
        plt.savefig(path)
        plt.close()
        return
    with open(path, "wb") as fh:
        fh.write(_png.render_bar_chart([d["frac"] for d in dens]))


def save_loss_curve_png(history: list[float], path: str) -> None:
    """train_autoencoder.py:254-270: per-epoch validation loss -> PNG file."""
    plt = _try_matplotlib()
    if plt is not None:  # pragma: no cover - matplotlib absent in CI image
        plt.figure(figsize=(8, 4))
        plt.plot(history)
        plt.xlabel("epoch")
        plt.ylabel("val_loss")
        plt.savefig(path)
        plt.close()
        return
    with open(path, "wb") as fh:
        fh.write(_png.render_line_chart(list(history)))
