"""Scale-growth experiment for the continuation-4 (wave8) plans.

Replicates the sf0.1 events/documents/embeddings N× with DISTINCT keys
(series extended IN TIME so per-series length grows — the hostile axis
for anything with a whole-series stage; doc ids offset with per-copy
text variants so vocab grows; vec ids offset so the candidate corpus
grows while the anchor set stays bounded) and times each wave8 shape
end-to-end with a noop sink.  Near-linear wall growth = no hidden
super-linear stage.  Usage::

    python tools/wave8_scale_growth.py [mult ...]   # default 1 4 10
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
    from prometheus_anomaly_detection_lstm_spark.plans import wave8
    from prometheus_anomaly_detection_lstm_spark.session import get_spark

    mults = [int(a) for a in sys.argv[1:]] or [1, 4, 10]
    spark = get_spark("wave8-scale-growth")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    sf = "/root/testdata/sf0.1"
    ev0 = load_table(spark, sf, "events")
    docs0 = load_table(spark, sf, "documents")
    emb0 = load_table(spark, sf, "embeddings")
    off = 1_000_000_000
    span_days = 31

    for mult in mults:
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
        emb = _rep(
            emb0,
            mult,
            lambda d, k: d.withColumn(
                "vec_id", F.col("vec_id") + F.lit(k * off)
            ),
        )
        droot = f"/tmp/wave8growth/m{mult}"
        ev.repartition(16).write.mode("overwrite").parquet(f"{droot}/ev")
        docs.repartition(16).write.mode("overwrite").parquet(f"{droot}/docs")
        emb.repartition(16).write.mode("overwrite").parquet(f"{droot}/emb")
        ev = spark.read.parquet(f"{droot}/ev")
        docs = spark.read.parquet(f"{droot}/docs")
        emb = spark.read.parquet(f"{droot}/emb")

        series = ev.select(
            F.col("event_type").alias("metric"),
            "ts",
            F.col("event_id").alias("seq"),
            "value",
        )
        shapes = {
            "key_skew_profile": lambda: wave8._key_profile(
                ev, "events", "user_id"
            ),
            "hard_negatives": lambda: wave8.hard_negatives(emb),
            "sax_symbols": lambda: wave8.sax_symbols(series),
            "pmi_collocations": lambda: wave8.pmi_collocations(docs),
            # time replication grows #chunks, not chunk length, so the
            # per-chunk FFT cost is constant and wall is linear
            "spectral_residual": lambda: wave8.spectral_residual_anomalies(
                series
            ),
            # the deliberately-sequential shape: per-series O(n) python
            # recursion over the hourly rollup; time replication grows
            # SERIES LENGTH, so wall tracks hourly-rollup rows / #series
            "holt_winters": lambda: wave8.holt_winters_anomalies(series),
            "centroid_drift": lambda: wave8.centroid_drift(emb),
            "seasonal_mad": lambda: wave8.seasonal_mad_anomalies(series),
            "knn_label_audit": lambda: wave8.knn_label_audit(emb),
            "sax_motifs": lambda: wave8.sax_motifs(series),
            "feature_hashing": lambda: wave8.feature_hashing_topk(docs),
            # NOTE pca fits driver-side per build() call (one-pass
            # moment aggregate), so its wall includes the fit scan
            "pca_scores": lambda: wave8.pca_anomaly_scores(
                ev.select(
                    "ts",
                    F.col("value").alias("f0"),
                    (F.col("value") * 2).alias("f1"),
                    F.col("user_id").cast("double").alias("f2"),
                ),
                ["f0", "f1", "f2"],
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
