"""Scale-growth experiment for the mining/diagnostics family.

Same method as round4_scale_growth.py: replicate the sf0.1 events N
times with DISTINCT series names (label cardinality grows — the
realistic axis for per-series windows) and time each shape end-to-end
with a noop sink.  Near-linear wall growth = no hidden super-linear
stage.  Usage: ``python tools/mining_scale_growth.py [mult ...]``;
one JSON line per multiplier, recorded in BASELINE.md.
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
    from prometheus_anomaly_detection_lstm_spark.plans import mining
    from prometheus_anomaly_detection_lstm_spark.session import get_spark

    mults = [int(a) for a in sys.argv[1:]] or [1, 4, 10]
    spark = get_spark("mining-scale-growth")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    sf = "/root/testdata/sf0.1"
    ev0 = load_table(spark, sf, "events")
    s0 = ev0.select(
        F.col("event_type").alias("metric"),
        "ts",
        F.col("event_id").alias("seq"),
        "value",
    )

    for mult in mults:
        samples = functools.reduce(
            lambda a, b: a.unionByName(b),
            [
                s0.withColumn(
                    "metric", F.concat(F.col("metric"), F.lit(f"_{k}"))
                )
                for k in range(mult)
            ],
        ).persist()
        out = {"mult": mult, "samples": samples.count()}

        def bench(name, df):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            out[name] = round(time.perf_counter() - t0, 2)

        bench("rolling_median", mining.rolling_median(samples))
        bench("change_points", mining.change_points(samples))
        bench("autocorrelation", mining.autocorrelation(samples))
        bench("mad_outliers", mining.mad_outliers(samples))
        bench("stl_decompose", mining.stl_decompose(samples))
        bench("m4_downsample", mining.m4_downsample(samples))
        bench("anomaly_ensemble", mining.anomaly_ensemble(samples))
        bench("distribution_drift", mining.distribution_drift(samples))
        bench("forecast_backtest", mining.forecast_backtest(samples))

        samples.unpersist()
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
