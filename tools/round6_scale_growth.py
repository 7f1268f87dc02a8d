"""Scale-growth experiment for the two round-6 caveat fixes:

- ``semantic_dedup_scaled`` (k = ceil(sqrt(n))) vs the fixed-k form —
  the fixed-k caveat was quadratic-within-cluster growth (BASELINE.md
  measured ~5x wall at 10x data); the scaled form should grow ~n^1.5.
- ``holt_smoothing_hourly`` (fold over the hourly rollup) vs the
  retired per-sample K=120 collect_list form — the rollup's fold work
  is bounded by hour cardinality, so wall should be flat-to-sublinear
  while the per-sample form tracks raw rows.

Same replication discipline as session2_scale_growth: embeddings get
distinct vec_ids + a per-copy element roll (non-degenerate clusters);
events get distinct event_ids + a small ts shift (samples-per-series
grows; hour cardinality stays FIXED — the production shape where
retention is bounded but sample rate grows).  One JSON line per
multiplier; recorded in BASELINE.md.

Usage: ``python tools/round6_scale_growth.py [mult ...]``
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
    from prometheus_anomaly_detection_lstm_spark.operators import kmeans as KM
    from prometheus_anomaly_detection_lstm_spark.operators.promql import (
        holt_smoothing,
        holt_smoothing_hourly,
    )
    from prometheus_anomaly_detection_lstm_spark.session import get_spark

    mults = [int(a) for a in sys.argv[1:]] or [1, 4, 10]
    spark = get_spark("round6-scale-growth")
    spark.sparkContext.setLogLevel("ERROR")
    sf = "/root/testdata/sf0.1"

    emb0 = load_table(spark, sf, "embeddings")
    ev0 = load_table(spark, sf, "events")

    for mult in mults:
        emb = functools.reduce(
            lambda a, b: a.unionByName(b),
            [
                emb0.withColumn(
                    "vec_id", F.col("vec_id") + F.lit(k * 100_000_000)
                ).withColumn(
                    "embedding",
                    F.concat(
                        F.slice("embedding", k % 64 + 1, 64 - (k % 64)),
                        F.slice("embedding", 1, k % 64),
                    ),
                )
                for k in range(mult)
            ],
        ).persist()
        ev = functools.reduce(
            lambda a, b: a.unionByName(b),
            [
                ev0.withColumn(
                    "event_id", F.col("event_id") + F.lit(k * 100_000_000)
                ).withColumn(
                    "ts", F.col("ts") + F.expr(f"INTERVAL {k * 7} SECONDS")
                )
                for k in range(mult)
            ],
        ).persist()
        out = {"mult": mult, "vecs": emb.count(), "events": ev.count()}

        ev_dir = f"/tmp/r6growth/ev_{mult}"
        emb_dir = f"/tmp/r6growth/emb_{mult}"
        ev.write.mode("overwrite").parquet(f"{ev_dir}/events.parquet")
        emb.write.mode("overwrite").parquet(f"{emb_dir}/embeddings.parquet")
        ev.unpersist()
        emb.unpersist()

        vec = KM._vec(spark, emb_dir)
        samples = load_table(spark, ev_dir, "events").select(
            "ts",
            F.col("event_type").alias("metric"),
            "value",
            F.col("event_id").alias("seq"),
        )
        from prometheus_anomaly_detection_lstm_spark.plans import wave8, wave9

        timings = [
            ("semdedup_fixed_k", lambda: KM.semantic_dedup(vec)),
            ("semdedup_scaled_k", lambda: KM.semantic_dedup_scaled(vec)),
            ("holt_per_sample", lambda: holt_smoothing(samples)),
            ("holt_hourly", lambda: holt_smoothing_hourly(samples)),
            # the wave-9 event-family: each is one keyed rollup +
            # metadata-scale math, so walls should track the rollup scan
            ("ramp_detect",
             lambda: wave8.q_metric_ramp_detect(spark, ev_dir)),
            ("glr_changepoint",
             lambda: wave9.q_metric_glr_changepoint(spark, ev_dir)),
            ("ar2_residuals",
             lambda: wave9.q_metric_ar2_residuals(spark, ev_dir)),
            ("ab_sequential",
             lambda: wave9.q_events_ab_sequential(spark, ev_dir)),
            ("anomaly_attribution",
             lambda: wave9.q_events_anomaly_attribution(spark, ev_dir)),
            ("esd_outliers",
             lambda: wave9.q_metric_esd_outliers(spark, ev_dir)),
        ]
        for name, mk in timings:
            t0 = time.perf_counter()
            mk().write.format("noop").mode("overwrite").save()
            out[name] = round(time.perf_counter() - t0, 2)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
