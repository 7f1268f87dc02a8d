"""Local replica of the driver's DuckDB-oracle comparison.

Runs a Spark query and its oracle SQL on the same sf dir and compares
row count, column names, and order-insensitive values (NaN-safe, float
tolerance at the shared rounding precision).
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def duck_run(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con.execute(sql).df()


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64").round(9)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), ignore_index=True)


def compare(spark_df, oracle_sql: str, sf_dir: str) -> list[str]:
    """Return a list of mismatch descriptions (empty = match)."""
    got = canonicalize(spark_df.toPandas())
    want = canonicalize(duck_run(oracle_sql, sf_dir))
    errs: list[str] = []
    if list(got.columns) != list(want.columns):
        errs.append(f"columns: spark={list(got.columns)} duck={list(want.columns)}")
        return errs
    if len(got) != len(want):
        errs.append(f"rowcount: spark={len(got)} duck={len(want)}")
        return errs
    for c in got.columns:
        g, w = got[c], want[c]
        if pd.api.types.is_float_dtype(g):
            ok = (
                (g.isna() & w.isna())
                | np.isclose(g.fillna(0), w.fillna(0), rtol=0, atol=1e-9)
            )
        else:
            ok = (g.isna() & w.isna()) | (g == w)
        bad = int((~ok).sum())
        if bad:
            idx = (~ok).idxmax()
            errs.append(
                f"col {c}: {bad} mismatched values, first at row {idx}: "
                f"spark={g[idx]!r} duck={w[idx]!r}"
            )
    return errs
