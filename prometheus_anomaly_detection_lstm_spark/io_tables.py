"""Canonical testdata table loader.

The driver-generated parquet stores timestamps as INT64
TIMESTAMP(NANOS) which Spark's vectorized reader rejects.  We read them
via the legacy nanos-as-long mode and convert to microsecond timestamps
with exact integer division (``div`` keeps the arithmetic in LONG —
a double division would lose precision at 1e18 nanoseconds).
Truncation toward zero matches DuckDB's TIMESTAMP_NS -> TIMESTAMP cast,
keeping oracle parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: nanosecond-timestamp columns per table.
TS_COLS: dict[str, list[str]] = {
    "events": ["ts"],
    "orders": ["o_orderdate"],
    "lineitem": ["l_shipdate"],
}

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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for c in TS_COLS.get(name, []):
        if dict(df.dtypes).get(c) == "bigint":
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"{c} div 1000")))
    return df


def write_day_partitioned(
    df: DataFrame,
    path: str,
    ts_col: str = "ts",
    mode: str = "overwrite",
) -> None:
    """Write a time-series frame as day-partitioned parquet — the
    standard lake layout (``path/__day=YYYY-MM-DD/...``).

    Partitioning by calendar day turns any day-range predicate into
    PARTITION PRUNING at read time: a query over one week of a 100-TB
    year touches ~2% of the files before a single row group is opened
    (the scan plan shows it as ``PartitionFilters``).  The partition
    column is derived, so the original ``ts_col`` stays intact in the
    data files.
    """
    (
        df.withColumn("__day", F.to_date(F.col(ts_col)))
        .write.mode(mode)
        .partitionBy("__day")
        .parquet(path)
    )


def read_day_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read a :func:`write_day_partitioned` dataset; ``__day`` comes
    back as a partition column usable in pruning predicates."""
    return spark.read.parquet(path)
