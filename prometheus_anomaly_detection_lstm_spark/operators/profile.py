"""Table profiling — the ANALYZE / data-quality surface.

One pass over the table produces per-column statistics (row count,
null count, exact distinct count, numeric min/max): the input to
ingestion validation, drift monitors, and the optimizer-statistics
story.  Implementation is a stack() unpivot (map-side projection, no
UDF) followed by ONE aggregate keyed on the column name — the shuffle
carries (column, value) pairs already reduced by partial aggregation.

Non-numeric values profile as NULL min/max via try_cast (ANSI-safe on
Spark 4; DuckDB's TRY_CAST matches).  At 100 TB the exact distinct
count is the expensive term (a per-column shuffle of distinct values,
here fused into the same stacked aggregate); the HLL sketch in
operators/approx.py is the drop-in when exactness isn't required.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io_tables import load_table

#: columns profiled for the registered events query.
EVENT_COLS = ["event_id", "ts", "user_id", "event_type", "value", "props"]


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """(column, n_rows, n_null, n_distinct, min_num, max_num) per col."""
    stack = ", ".join(f"'{c}', CAST({c} AS STRING)" for c in cols)
    long = df.selectExpr(
        f"stack({len(cols)}, {stack}) AS (column, str_val)"
    ).withColumn("num_val", F.expr("try_cast(str_val AS DOUBLE)"))
    return long.groupBy("column").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("str_val").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_null"),
        F.countDistinct("str_val").alias("n_distinct"),
        F.round(F.min("num_val"), 6).alias("min_num"),
        F.round(F.max("num_val"), 6).alias("max_num"),
    )


def q_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return profile_columns(load_table(spark, sf_dir, "events"), EVENT_COLS)


def _profile_oracle() -> str:
    arms = "\nUNION ALL\n".join(
        f"""SELECT '{c}' AS "column", CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN CAST({c} AS VARCHAR) IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
       CAST(count(DISTINCT CAST({c} AS VARCHAR)) AS BIGINT) AS n_distinct,
       round(min(TRY_CAST(CAST({c} AS VARCHAR) AS DOUBLE)), 6) AS min_num,
       round(max(TRY_CAST(CAST({c} AS VARCHAR) AS DOUBLE)), 6) AS max_num
FROM events"""
        for c in EVENT_COLS
    )
    return arms


QUERIES = {
    "table_profile": (q_table_profile, _profile_oracle()),
}
