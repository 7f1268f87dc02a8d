"""Bucketed tables: co-located joins plan with ZERO exchanges."""

from __future__ import annotations

from pyspark.sql import functions as F

from prometheus_anomaly_detection_lstm_spark.io_tables import (
    load_table,
    read_bucketed,
    write_bucketed,
)

from .conftest import SF_SMALL


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    li = load_table(spark, SF_SMALL, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    orders = load_table(spark, SF_SMALL, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    write_bucketed(li, "li_b", "l_orderkey", n_buckets=8, sort_col="l_orderkey")
    write_bucketed(
        orders, "orders_b", "o_orderkey", n_buckets=8, sort_col="o_orderkey"
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # at-scale regime: neither fact side broadcasts (that is the
        # whole point of bucketing); at test scale AQE would broadcast
        # and skip the bucketed read entirely
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.adaptive.autoBroadcastJoinThreshold", "-1"
        )
        a = read_bucketed(spark, "li_b")
        b = read_bucketed(spark, "orders_b")
        joined = a.join(b, a.l_orderkey == b.o_orderkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan[:600]
        assert "Exchange" not in plan, plan[:900]
        # same rows as the shuffled join of the raw frames
        raw = li.join(orders, li.l_orderkey == orders.o_orderkey)
        assert joined.count() == raw.count()
        # bucketed AGGREGATION on the key also skips its exchange
        agg = a.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
        agg_plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in agg_plan, agg_plan[:900]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS orders_b")
