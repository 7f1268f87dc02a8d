"""Feature scaling with sklearn-exact semantics (SURVEY §2.5-A4/A5, M1, H2).

The reference fits ``MinMaxScaler`` / ``StandardScaler`` over ALL columns
of the processed frame — including the two calendar features
(preprocess_data.py:85-93; load-bearing, see SURVEY §3.2) — and persists
the fitted scaler (joblib).  Here the "scaler artifact" is a tiny params
DataFrame (feature, min, max, mean, std_pop) — trivially persistable as
Parquet/JSON (S9) and exactly reproducible, unlike MLlib's scalers:

* MinMax degenerate range: sklearn maps a constant column to 0
  (``scale_`` falls back to 1) — replicated via a CASE on max==min.
* StandardScaler uses POPULATION std (ddof=0); Spark's ``stddev`` and
  MLlib's StandardScaler are sample std — we use ``stddev_pop``.

Fit is a single global aggregation (map-side partial, one exchange to a
1-row frame); transform is a broadcast cross join + projections — pure
Catalyst, no UDF, fully codegen'd.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fit_params(df: DataFrame, cols: list[str]) -> DataFrame:
    """Fit both scalers at once -> long params table (F4 fixture shape).

    One row per feature: (feature, min, max, mean, std_pop).
    """
    agg = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"min_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"max_{c}") for c in cols],
        *[F.avg(c).alias(f"mean_{c}") for c in cols],
        *[F.stddev_pop(c).alias(f"std_{c}") for c in cols],
    )
    stack_expr = ", ".join(
        f"'{c}', min_{c}, max_{c}, mean_{c}, std_{c}" for c in cols
    )
    return agg.selectExpr(
        f"stack({len(cols)}, {stack_expr}) AS (feature, min, max, mean, std_pop)"
    )


def _wide_params(df: DataFrame, cols: list[str], which: str) -> DataFrame:
    if which == "minmax":
        return df.agg(
            *[F.min(c).alias(f"__lo_{c}") for c in cols],
            *[F.max(c).alias(f"__hi_{c}") for c in cols],
        )
    return df.agg(
        *[F.avg(c).alias(f"__mu_{c}") for c in cols],
        *[F.stddev_pop(c).alias(f"__sd_{c}") for c in cols],
    )


def minmax_transform(df: DataFrame, cols: list[str]) -> DataFrame:
    """M1/A4: ``(x - min) / (max - min)``; constant column -> 0.0.

    sklearn MinMaxScaler semantics (preprocess_data.py:93): zero range
    uses scale 1, so output is ``x - min`` = 0 for every row.
    """
    params = _wide_params(df, cols, "minmax")
    out = df.crossJoin(F.broadcast(params))
    for c in cols:
        lo, hi = F.col(f"__lo_{c}"), F.col(f"__hi_{c}")
        scaled = F.when(hi == lo, F.col(c) - lo).otherwise(
            (F.col(c) - lo) / (hi - lo)
        )
        out = out.withColumn(c, scaled)
    return out.drop(
        *[f"__lo_{c}" for c in cols], *[f"__hi_{c}" for c in cols]
    )


def minmax_project(df: DataFrame, cols: list[str]) -> DataFrame:
    """MinMax transform as a PURE projection over pre-attached params.

    Expects ``__lo_{c}`` / ``__hi_{c}`` columns (e.g. from
    ``fill.ffill_bfill_scalable(attach_minmax=cols)``) — the fused
    pipeline shape that avoids re-computing the upstream plan under a
    separate fit aggregation.  Same sklearn semantics as
    :func:`minmax_transform` (constant column -> 0.0).
    """
    # one select with one parsed expression per scaled column: the
    # withColumn-per-column form re-analyzes the growing plan each
    # iteration (~190 ms of construction latency for 7 features)
    drop = {f"__lo_{c}" for c in cols} | {f"__hi_{c}" for c in cols}
    scaled = {
        c: F.expr(
            f"CASE WHEN `__hi_{c}` = `__lo_{c}` THEN `{c}` - `__lo_{c}`"
            f" ELSE (`{c}` - `__lo_{c}`) / (`__hi_{c}` - `__lo_{c}`)"
            f" END"
        ).alias(c)
        for c in cols
    }
    return df.select(
        *[
            scaled.get(c, c)
            for c in df.columns
            if c not in drop
        ]
    )


def standard_transform(df: DataFrame, cols: list[str]) -> DataFrame:
    """M1/A5: ``(x - mean) / std_pop``; zero std -> ``x - mean`` (sklearn)."""
    params = _wide_params(df, cols, "standard")
    out = df.crossJoin(F.broadcast(params))
    for c in cols:
        mu, sd = F.col(f"__mu_{c}"), F.col(f"__sd_{c}")
        scaled = F.when(sd == 0.0, F.col(c) - mu).otherwise((F.col(c) - mu) / sd)
        out = out.withColumn(c, scaled)
    return out.drop(
        *[f"__mu_{c}" for c in cols], *[f"__sd_{c}" for c in cols]
    )


SCALERS = {"MinMaxScaler": minmax_transform, "StandardScaler": standard_transform}


def scale_data(df: DataFrame, cols: list[str], scaler_type: str = "MinMaxScaler") -> DataFrame:
    """Dispatch; unknown scaler falls back to MinMax (preprocess_data.py:89-91)."""
    return SCALERS.get(scaler_type, minmax_transform)(df, cols)
