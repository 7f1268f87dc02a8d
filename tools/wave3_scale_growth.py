"""Scale-growth experiment for the round-3 additions.

Same method as relational_scale_growth.py: replicate the sf0.1 inputs
N times with DISTINCT keys (orderkeys offset, series renamed, doc/vec
ids offset — so key cardinalities grow with volume, the realistic
axis) and time each shape end-to-end with a noop sink.  Near-linear
wall growth = no hidden super-linear stage.  Usage:
``python tools/wave3_scale_growth.py [mult ...]``; one JSON line per
multiplier, recorded in BASELINE.md.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _rep(df, mult, build):
    return functools.reduce(
        lambda a, b: a.unionByName(b), [build(df, k) for k in range(mult)]
    )


def main() -> None:
    from pyspark.sql import functions as F

    from prometheus_anomaly_detection_lstm_spark.io_tables import load_table
    from prometheus_anomaly_detection_lstm_spark.operators import linalg, promql, text
    from prometheus_anomaly_detection_lstm_spark.plans import tpch_wave3
    from prometheus_anomaly_detection_lstm_spark.session import get_spark

    mults = [int(a) for a in sys.argv[1:]] or [1, 4, 10]
    spark = get_spark("wave3-scale-growth")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    sf = "/root/testdata/sf0.1"
    li0 = load_table(spark, sf, "lineitem")
    or0 = load_table(spark, sf, "orders")
    supp = load_table(spark, sf, "supplier")
    nation = load_table(spark, sf, "nation")
    ev0 = load_table(spark, sf, "events")
    docs0 = load_table(spark, sf, "documents")
    emb0 = load_table(spark, sf, "embeddings")
    off = 1_000_000_000

    for mult in mults:
        li = _rep(
            li0, mult,
            lambda d, k: d.withColumn("l_orderkey", F.col("l_orderkey") + k * off),
        ).persist()
        orders = _rep(
            or0, mult,
            lambda d, k: d.withColumn("o_orderkey", F.col("o_orderkey") + k * off),
        ).persist()
        # series cardinality grows with volume: metric_k suffix per copy
        samples = _rep(
            ev0.select(
                "ts",
                F.col("event_type").alias("metric"),
                "value",
                F.col("event_id").alias("seq"),
            ),
            mult,
            lambda d, k: d.withColumn(
                "metric", F.concat(F.col("metric"), F.lit(f"_{k}"))
            ),
        ).persist()
        docs = _rep(
            docs0, mult,
            lambda d, k: d.withColumn("doc_id", F.col("doc_id") + k * off),
        ).persist()
        emb = _rep(
            emb0, mult,
            lambda d, k: d.withColumn("vec_id", F.col("vec_id") + k * off),
        ).persist()
        out = {"mult": mult, "lineitem": li.count(), "samples": samples.count(),
               "docs": docs.count(), "vecs": emb.count()}

        def bench(name, df):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            out[name] = round(time.perf_counter() - t0, 2)

        # q21 shape: one per-order aggregate replaces two EXISTS self-joins
        flags = (
            li.join(
                orders.filter(F.col("o_orderstatus") == "F"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .select(
                "o_orderkey", "l_suppkey",
                (F.col("l_shipdate")
                 > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("__late"),
            )
        )
        per_order = flags.groupBy("o_orderkey").agg(
            F.countDistinct("l_suppkey").alias("__n_supp"),
            F.countDistinct(
                F.when(F.col("__late"), F.col("l_suppkey"))
            ).alias("__n_late"),
        )
        q21 = (
            flags.filter(F.col("__late"))
            .join(
                per_order.filter(
                    (F.col("__n_supp") > 1) & (F.col("__n_late") == 1)
                ).select("o_orderkey"),
                "o_orderkey",
            )
            .groupBy("l_suppkey").agg(F.count("*").alias("numwait"))
            .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
            .join(F.broadcast(nation),
                  F.col("s_nationkey") == F.col("n_nationkey"))
        )
        bench("q21", q21)
        bench("promql_rate", promql.counter_rate(samples))
        bench("promql_hist", promql.histogram_quantile(samples))
        bench("frequent_tokens", text.frequent_tokens(docs))
        bench("covariance", linalg.embedding_covariance(emb))

        for df in (li, orders, samples, docs, emb):
            df.unpersist()
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
