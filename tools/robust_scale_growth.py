"""Scale-growth experiment for the robust-stats plans + PromQL compiler.

Replicates the sf0.1 events/documents N× with DISTINCT keys (event ids
and timestamps offset per copy so series GROW in length; doc ids offset
with a per-copy text suffix so vocab/char distributions grow) and times
each new shape end-to-end with a noop sink.  Near-linear wall growth =
no hidden super-linear stage.  Usage::

    python tools/robust_scale_growth.py [mult ...]   # default 1 4 10
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
        matrixprofile,
        promql_lang,
    )
    from prometheus_anomaly_detection_lstm_spark.plans import robust
    from prometheus_anomaly_detection_lstm_spark.session import get_spark

    mults = [int(a) for a in sys.argv[1:]] or [1, 4, 10]
    spark = get_spark("robust-scale-growth")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    sf = "/root/testdata/sf0.1"
    ev0 = load_table(spark, sf, "events")
    docs0 = load_table(spark, sf, "documents")
    off = 1_000_000_000
    span_days = 31  # testdata covers one month; shift copies past it

    for mult in mults:
        # copies extend each series IN TIME (same labels, later samples)
        # so per-series length grows with mult — the hostile axis for
        # the CUSUM running windows and Theil-Sen pair join
        ev = _rep(
            ev0,
            mult,
            lambda d, k: d.withColumn(
                "event_id", F.col("event_id") + F.lit(k * off)
            ).withColumn(
                "ts", F.col("ts") + F.expr(f"INTERVAL {k * span_days} DAYS")
            ),
        )
        docs = _rep(
            docs0,
            mult,
            lambda d, k: d.withColumn(
                "doc_id", F.col("doc_id") + F.lit(k * off)
            ).withColumn(
                "text",
                F.col("text")
                if k == 0
                else F.concat(F.col("text"), F.lit(f" copyvariant{k}")),
            ),
        )
        droot = f"/tmp/robustgrowth/m{mult}"
        ev.repartition(16).write.mode("overwrite").parquet(f"{droot}/ev")
        docs.repartition(16).write.mode("overwrite").parquet(f"{droot}/docs")
        ev = spark.read.parquet(f"{droot}/ev")
        docs = spark.read.parquet(f"{droot}/docs")

        series = ev.select(
            F.col("event_type").alias("metric"),
            "ts",
            F.col("event_id").alias("seq"),
            "value",
        )
        labeled = ev.select(
            "ts",
            "value",
            F.col("event_id").alias("seq"),
            F.col("event_type").alias("metric"),
            (F.get_json_object(F.col("props"), "$.k").cast("bigint") % 10)
            .cast("bigint")
            .alias("label"),
        )
        shapes = {
            "cusum": lambda: robust.cusum_anomalies(series),
            "theil_sen": lambda: robust.theil_sen_trend(series),
            "char_entropy": lambda: robust.char_entropy(docs),
            "zipf_fit": lambda: robust.zipf_fit(docs),
            "funnel_timing": lambda: robust.funnel_timing(ev),
            "heavy_hitters": lambda: robust.heavy_hitters(ev),
            "promql_lang_rate_sum": lambda: promql_lang.eval_promql(
                'sum by (label) (rate(click{label=~"[0-3]"}[10m]))', labeled
            ),
            "promql_lang_topk": lambda: promql_lang.eval_promql(
                "topk(3, avg_over_time(view[10m]))", labeled
            ),
            # time-replication grows #chunks, not chunk length, so the
            # per-chunk quadratic cost is constant and wall is linear
            "matrix_profile": lambda: matrixprofile.matrix_profile_discords(
                series
            ),
        }
        timings = {}
        for name, build in shapes.items():
            df = build()
            df.write.format("noop").mode("overwrite").save()  # warm
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            timings[name] = round(best, 3)
        print(
            json.dumps(
                {"mult": mult, "events": ev.count(), "queries": timings}
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
