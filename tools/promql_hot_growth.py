"""Hot-series (label-cardinality) growth harness for the PromQL family
(round-4 verdict task 7).

`operators/promql._with_deltas` computes per-series lag windows whose
parallelism is bounded by SERIES CARDINALITY — one counter holding
most samples runs its entire lag chain on one task.  The
``hot_series=True`` fallback (`_with_deltas_hot`) day-buckets the lag
so parallelism becomes #series × #days.  The fallback's answer
equality is pinned in tests/test_promql.py; this harness exercises the
PATHOLOGICAL AXIS it was built for — one series holding ~90% of an
ever-growing sample volume — and records where the plain window
serializes while the fallback stays flat.

    python tools/promql_hot_growth.py

Input shape per scale step: the sf0.1 events table replicated k× with
per-copy time offsets (sample volume grows; the time RANGE grows with
it, so the fallback's day-bucket count grows too — the realistic
axis: a long-lived hot counter accumulates history), then relabeled so
90% of rows land on ONE `hot` series and the rest spread over 50 cold
series.  Timing: noop write end-to-end, best of 3 after one warm run.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from prometheus_anomaly_detection_lstm_spark.io_tables import load_table
from prometheus_anomaly_detection_lstm_spark.operators.promql import counter_rate
from prometheus_anomaly_detection_lstm_spark.session import get_spark

SRC = "/root/testdata/sf0.1"
OUT = "/tmp/promql_hot"
MULTS = [1, 4, 10]
COLD_SERIES = 50
HOT_FRACTION = 0.9


def build(spark, mult: int) -> str:
    """Replicate events mult× with day offsets, relabel 90% hot."""
    path = f"{OUT}/m{mult}"
    base = load_table(spark, SRC, "events").select(
        "ts", F.col("event_id").alias("seq"), "value"
    )
    copies = [
        base.withColumn("ts", F.expr(f"ts + INTERVAL {k * 30} DAYS"))
        .withColumn("seq", F.col("seq") + F.lit(k * 1_000_000_000))
        for k in range(mult)
    ]
    df = copies[0]
    for c in copies[1:]:
        df = df.unionByName(c)
    labeled = df.withColumn(
        "metric",
        F.when(
            F.pmod(F.hash("seq"), 100) < int(HOT_FRACTION * 100),
            F.lit("hot_counter"),
        ).otherwise(
            F.concat(
                F.lit("cold_"),
                (F.pmod(F.hash("seq", F.lit(7)), COLD_SERIES)).cast("string"),
            )
        ),
    )
    labeled.repartition(16).write.mode("overwrite").parquet(path)
    return path


def main() -> None:
    spark = get_spark("promql-hot-growth")
    spark.sparkContext.setLogLevel("ERROR")
    print("mult rows plain_s hot_s", flush=True)
    for mult in MULTS:
        path = build(spark, mult)
        samples = spark.read.parquet(path)
        n = samples.count()
        results = {}
        for label, flag in (("plain", False), ("hot", True)):
            df = counter_rate(samples, hot_series=flag)
            df.write.format("noop").mode("overwrite").save()  # warm
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            results[label] = round(best, 3)
        print(
            f"{mult}x {n} {results['plain']} {results['hot']}", flush=True
        )


if __name__ == "__main__":
    main()
