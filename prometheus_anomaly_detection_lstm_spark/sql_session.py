"""SQL surface: register the engine's tables + derived views so users
query with plain ``spark.sql`` — Catalyst plans SQL and DataFrame code
identically, so everything the registry proves correct is reachable
from SQL too.

    from prometheus_anomaly_detection_lstm_spark.sql_session import open_sql_session
    spark = open_sql_session("/root/testdata/sf0.01")
    spark.sql("SELECT event_type, count(*) FROM events GROUP BY 1").show()
    spark.sql("SELECT * FROM metrics_wide ORDER BY ts LIMIT 5").show()
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from .io_tables import TABLES, load_table
from .plans import pipeline as P
from .session import get_spark


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Base tables as temp views + the pipeline's derived views."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
    P.wide_frame(spark, sf_dir).createOrReplaceTempView("metrics_wide")
    P.preprocessed(spark, sf_dir).createOrReplaceTempView("metrics_scaled")
    P.anomaly_scores(spark, sf_dir).createOrReplaceTempView("anomaly_scores")


def open_sql_session(sf_dir: str) -> SparkSession:
    spark = get_spark("sql")
    register_views(spark, sf_dir)
    return spark
