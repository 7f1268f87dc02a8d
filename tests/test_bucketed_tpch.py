"""Routing TPC-H q3/q5 through an orderkey-bucketed lake layout.

BASELINE.md names tpch_q3/q5 as sf1 optimization targets whose gap is
the orders⋈lineitem exchange (both facts shuffle on orderkey for every
run).  Bucketing pays that shuffle once at write time; these pins
prove the storage-policy remedy works through the UNCHANGED query
logic (`tpch_q3_core`/`tpch_q5_core`): same answer, and the two
fact-side exchanges on orderkey disappear from the plan.
"""

from __future__ import annotations

from prometheus_anomaly_detection_lstm_spark.io_tables import (
    load_table,
    read_bucketed,
    write_bucketed,
)
from prometheus_anomaly_detection_lstm_spark.plans.relational import (
    tpch_q3_core,
    tpch_q5_core,
)

from .conftest import SF_SMALL


def _exchange_count(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange hashpartitioning")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_bucketed_q3_q5_drop_fact_exchanges(spark, tmp_path):
    li = load_table(spark, SF_SMALL, "lineitem")
    orders = load_table(spark, SF_SMALL, "orders")
    cust = load_table(spark, SF_SMALL, "customer")
    supp = load_table(spark, SF_SMALL, "supplier")
    nation = load_table(spark, SF_SMALL, "nation")
    region = load_table(spark, SF_SMALL, "region")

    write_bucketed(
        li, "li_q3b", "l_orderkey", n_buckets=8, sort_col="l_orderkey"
    )
    write_bucketed(
        orders, "ord_q3b", "o_orderkey", n_buckets=8, sort_col="o_orderkey"
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # at-scale regime: no side broadcasts (at 100 TB neither fact
        # nor the filtered customer segment fits); the orderkey join
        # must then be a shuffle join UNLESS the layout pre-buckets it
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

        li_b, ord_b = read_bucketed(spark, "li_q3b"), read_bucketed(
            spark, "ord_q3b"
        )

        plain_q3 = tpch_q3_core(li, orders, cust)
        bucketed_q3 = tpch_q3_core(li_b, ord_b, cust)
        # identical answers through the identical logic
        assert _rows(plain_q3) == _rows(bucketed_q3)
        # AT LEAST the two fact-side orderkey exchanges are gone; in
        # practice more disappear (q3's groupBy leads with l_orderkey,
        # so the final aggregation ALSO reuses the bucket distribution
        # — measured 10 -> 6 exchange mentions at this scale)
        assert _exchange_count(bucketed_q3) <= _exchange_count(plain_q3) - 2

        plain_q5 = tpch_q5_core(li, orders, cust, supp, nation, region)
        bucketed_q5 = tpch_q5_core(li_b, ord_b, cust, supp, nation, region)
        assert _rows(plain_q5) == _rows(bucketed_q5)
        assert _exchange_count(bucketed_q5) <= _exchange_count(plain_q5) - 2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS li_q3b")
        spark.sql("DROP TABLE IF EXISTS ord_q3b")
