"""Scale-growth experiment: second-wave TPC-H shapes vs fact volume.

Replicates the sf0.1 lineitem/orders fact tables N times with DISTINCT
keys (orderkeys offset per copy so join fan-outs and group cardinalities
grow realistically) and times the join-heavy wave-2 queries end-to-end.
Near-linear wall growth demonstrates the plans carry no hidden
super-linear stage (n² candidate spaces, driver collects, global
sorts).  Prints one JSON line per multiplier; results recorded in
BASELINE.md.  Usage: ``python tools/relational_scale_growth.py
[mult ...]``.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F

    from prometheus_anomaly_detection_lstm_spark.io_tables import load_table
    from prometheus_anomaly_detection_lstm_spark.session import get_spark

    mults = [int(a) for a in sys.argv[1:]] or [1, 4, 10]
    spark = get_spark("relational-scale-growth")
    spark.sparkContext.setLogLevel("ERROR")
    sf = "/root/testdata/sf0.1"
    li0 = load_table(spark, sf, "lineitem")
    or0 = load_table(spark, sf, "orders")
    cust = load_table(spark, sf, "customer")
    nation = load_table(spark, sf, "nation")
    part = load_table(spark, sf, "part")

    for mult in mults:
        off = 1_000_000_000
        li = functools.reduce(
            lambda a, b: a.unionByName(b),
            [
                li0.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(k * off))
                for k in range(mult)
            ],
        ).persist()
        orders = functools.reduce(
            lambda a, b: a.unionByName(b),
            [
                or0.withColumn("o_orderkey", F.col("o_orderkey") + F.lit(k * off))
                for k in range(mult)
            ],
        ).persist()
        out = {"mult": mult, "lineitem": li.count(), "orders": orders.count()}

        def bench(name, df):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            out[name] = round(time.perf_counter() - t0, 2)

        # q10 shape: fact-fact join funnel + dim joins + group
        q10 = (
            li.filter(F.col("l_returnflag") == "R")
            .join(
                orders.filter(
                    (F.col("o_orderdate") >= F.expr("TIMESTAMP_NTZ '1996-01-01 00:00:00'"))
                    & (F.col("o_orderdate") < F.expr("TIMESTAMP_NTZ '1996-07-01 00:00:00'"))
                ),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .join(cust, F.col("o_custkey") == F.col("c_custkey"))
            .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
            .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
            .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        )
        bench("q10", q10)

        # q18 shape: aggregate-then-join on the shared orderkey
        big = (
            li.groupBy("l_orderkey")
            .agg(F.sum("l_quantity").alias("total_qty"))
            .filter(F.col("total_qty") > 260)
        )
        q18 = big.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).join(
            cust, F.col("o_custkey") == F.col("c_custkey")
        )
        bench("q18", q18)

        # q19 shape: disjunctive predicate across the part join
        p = part.filter(F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3"))
        q, s, b = F.col("l_quantity"), F.col("p_size"), F.col("p_brand")
        blocks = (
            ((b == "Brand#1") & s.between(1, 15) & q.between(1, 20))
            | ((b == "Brand#2") & s.between(10, 30) & q.between(10, 35))
            | ((b == "Brand#3") & s.between(20, 50) & q.between(20, 50))
        )
        q19 = (
            li.join(p, F.col("l_partkey") == F.col("p_partkey"))
            .filter(blocks)
            .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        )
        bench("q19", q19)

        li.unpersist()
        orders.unpersist()
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
