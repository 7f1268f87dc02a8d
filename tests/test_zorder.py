"""Z-order clustering: per-file min/max footprints shrink on BOTH
columns (the property that makes parquet stats prune files)."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from prometheus_anomaly_detection_lstm_spark.io_tables import (
    cluster_by_zorder,
    load_table,
)

from .conftest import SF_SMALL


def _avg_span_fraction(path: str, col: str) -> float:
    """Mean over files of (col_max - col_min) / global_range — 1.0 means
    every file spans the whole domain (no skipping possible)."""
    spans, lo, hi = [], None, None
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        fmin = fmax = None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    s = c.statistics
                    fmin = s.min if fmin is None else min(fmin, s.min)
                    fmax = s.max if fmax is None else max(fmax, s.max)
        spans.append((fmin, fmax))
        lo = fmin if lo is None else min(lo, fmin)
        hi = fmax if hi is None else max(hi, fmax)
    rng = float(hi - lo) or 1.0
    return sum(float(b - a) for a, b in spans) / len(spans) / rng


def test_zorder_narrows_file_footprints_on_both_columns(spark, tmp_path):
    ev = load_table(spark, SF_SMALL, "events").select(
        "event_id", "user_id", "value", "ts"
    )
    shuffled = str(tmp_path / "shuffled")
    zordered = str(tmp_path / "zordered")
    # worst case baseline: hash-scattered layout (every file spans all)
    ev.repartition(8, "event_id").write.parquet(shuffled)
    cluster_by_zorder(ev, zordered, "user_id", "value", n_files=8)

    assert (
        spark.read.parquet(zordered).count() == ev.count()
    )
    base_a = _avg_span_fraction(shuffled, "user_id")
    base_b = _avg_span_fraction(shuffled, "value")
    z_a = _avg_span_fraction(zordered, "user_id")
    z_b = _avg_span_fraction(zordered, "value")
    # hash layout: files span most of the domain on both columns
    # (value has heavy tails, so its min/max spans sit lower than
    # user_id's near-1.0 — the meaningful claim is the RELATIVE shrink)
    assert base_a > 0.9 and base_b > 0.5
    # z-order: BOTH columns' footprints shrink materially (file pruning
    # becomes possible on either predicate)
    assert z_a < 0.6 * base_a, (z_a, base_a)
    assert z_b < 0.6 * base_b, (z_b, base_b)
