"""Streaming PSI drift: live windows scored against a frozen reference.

The serving-time half of plans/mining.distribution_drift: a REFERENCE
decile profile (edges + smoothed shares per series) is learned once
from history in batch, broadcast into the stream as a static side, and
every finalized event-time window scores its own histogram against it
with the same Laplace-smoothed PSI formula — the drift monitor that
pages when the serving distribution walks away from training.

Structured-Streaming shape: bucket assignment is a map-only projection
after the stream-static broadcast join; the ONE windowed aggregate
produces all ten bucket counts as conditional sums (a second
normalization aggregate is not allowed in a stream, so shares are
derived in the projection from the window's own total); append mode +
watermark emit each window exactly once with bounded state
(#series x open windows x 10 longs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.mining import (
    PSI_N_BUCKETS as N_BUCKETS,
    PSI_QS,
    PSI_SMOOTH,
    psi_bucket_expr,
)


def reference_profile(batch: DataFrame) -> DataFrame:
    """(metric, bs: decile edges, ref_n: per-bucket counts) learned from
    a history frame carrying (metric, value)."""
    qs = ", ".join(repr(q) for q in PSI_QS)
    edges = batch.groupBy("metric").agg(
        F.expr(f"percentile(value, array({qs}))").alias("bs")
    )
    bucket = psi_bucket_expr("bs")
    counts = (
        batch.join(edges, "metric")
        .select("metric", bucket.alias("__b"))
        .groupBy("metric")
        .agg(
            *[
                F.count_if(F.col("__b") == i).alias(f"__r{i}")
                for i in range(N_BUCKETS)
            ]
        )
    )
    return edges.join(counts, "metric").select(
        "metric",
        "bs",
        F.array(*[f"__r{i}" for i in range(N_BUCKETS)]).alias("ref_n"),
    )


def _psi_expr():
    """PSI from the window's bucket-count columns vs the reference
    array, Laplace-smoothed exactly like the batch operator."""
    total_a = sum(F.col(f"__a{i}") for i in range(N_BUCKETS))
    total_e = F.aggregate(
        "ref_n", F.lit(0).cast("bigint"), lambda acc, x: acc + x
    )
    term = None
    for i in range(N_BUCKETS):
        a = (F.col(f"__a{i}") + PSI_SMOOTH) / (
            total_a + N_BUCKETS * PSI_SMOOTH
        )
        e = (F.col("ref_n")[i] + PSI_SMOOTH) / (
            total_e + N_BUCKETS * PSI_SMOOTH
        )
        t = (a - e) * F.log(a / e)
        term = t if term is None else term + t
    return term


def streaming_psi(
    stream: DataFrame,
    profile: DataFrame,
    window_duration: str = "1 hour",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Per (event-time window, series): sample count and PSI vs the
    broadcast reference profile.  ``stream`` carries (ts, metric,
    value); ``profile`` is :func:`reference_profile`'s output."""
    bucket = psi_bucket_expr("bs")
    joined = stream.join(F.broadcast(profile), "metric").withColumn(
        "__b", bucket
    )
    agg = (
        joined.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_duration).alias("w"), "metric")
        .agg(
            F.first("ref_n").alias("ref_n"),
            *[
                F.count_if(F.col("__b") == i).alias(f"__a{i}")
                for i in range(N_BUCKETS)
            ],
        )
    )
    n = sum(F.col(f"__a{i}") for i in range(N_BUCKETS))
    return agg.select(
        F.col("w.start").alias("w_start"),
        "metric",
        n.alias("n_samples"),
        F.round(_psi_expr(), 6).alias("psi"),
    )
