"""Scale-growth experiment for the round-4 additions.

Same method as wave3_scale_growth.py: replicate the sf0.1 inputs N
times with DISTINCT keys (series renamed per copy — cardinality grows,
the realistic axis; doc ids offset with per-copy text suffix so shingle
spaces grow too) and time each new shape end-to-end with a noop sink.
Near-linear wall growth = no hidden super-linear stage.  Usage:
``python tools/round4_scale_growth.py [mult ...]``; one JSON line per
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
    from prometheus_anomaly_detection_lstm_spark.operators import (
        corpus,
        dedup,
        promql,
    )
    from prometheus_anomaly_detection_lstm_spark.session import get_spark

    mults = [int(a) for a in sys.argv[1:]] or [1, 4, 10]
    spark = get_spark("round4-scale-growth")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    sf = "/root/testdata/sf0.1"
    ev0 = load_table(spark, sf, "events")
    docs0 = load_table(spark, sf, "documents")
    off = 1_000_000_000

    for mult in mults:
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
            docs0,
            mult,
            lambda d, k: d.withColumn(
                "doc_id", F.col("doc_id") + k * off
            ).withColumn(
                "text",
                F.concat(F.col("text"), F.lit(f" copyvariant{k}"))
                if k
                else F.col("text"),
            ),
        ).persist()
        out = {
            "mult": mult,
            "samples": samples.count(),
            "docs": docs.count(),
        }

        def bench(name, df):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            out[name] = round(time.perf_counter() - t0, 2)

        bench("ewma", promql.metric_ewma(samples))
        bench("changes_resets", promql.changes_resets(samples))
        bench("subquery_max_rate", promql.subquery_max_rate(samples))
        bench("alert_episodes", promql.alert_episodes(samples, z=1.5))
        bench("rate_offset", promql.rate_offset_delta(samples))
        bench("twa", promql.time_weighted_avg(samples))
        bench("hot_series_rate", promql.counter_rate(samples, hot_series=True))
        bench("containment", dedup.containment_pairs(docs))
        bench("mixture", corpus.mixture_sample(docs))
        bench(
            "upsert",
            corpus.upsert_latest(
                docs.select("doc_id", "lang", "source", "text"),
                docs.select("doc_id", "lang", "source", "text").filter(
                    F.col("doc_id") % 7 == 0
                ),
                ("doc_id",),
            ),
        )

        for df in (samples, docs):
            df.unpersist()
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
