"""Scale-growth experiment for the round-4 second-session operators:
k-means / SemDeDup over embeddings, PageRank / SCD2 / grouping-sets /
rank-functions over events, Holt smoothing and seasonal anomaly over
the sample stream.

Embeddings replicate with distinct vec_ids and a per-copy deterministic
rotation of the vector (element roll), so centroids/clusters stay
non-degenerate instead of collapsing onto N-way duplicates.  Events
replicate with distinct event_ids/user_ids and a per-copy ts shift
inside the same day span, so series cardinality AND samples-per-series
both grow.  Prints one JSON line per multiplier; recorded in
BASELINE.md.  Usage: ``python tools/session2_scale_growth.py [mult ...]``.
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
        seasonal_anomaly,
    )
    from prometheus_anomaly_detection_lstm_spark.plans.extended import (
        q_event_pagerank,
        q_scd2_user_bands,
        q_events_grouping_sets,
        q_events_rank_functions,
    )
    from prometheus_anomaly_detection_lstm_spark.session import get_spark

    mults = [int(a) for a in sys.argv[1:]] or [1, 4, 10]
    spark = get_spark("session2-scale-growth")
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
                )
                .withColumn("user_id", F.col("user_id") + F.lit(k * 1_000_000))
                .withColumn(
                    "ts", F.col("ts") + F.expr(f"INTERVAL {k * 7} SECONDS")
                )
                for k in range(mult)
            ],
        ).persist()
        out = {"mult": mult, "vecs": emb.count(), "events": ev.count()}

        ev_dir = f"/tmp/s2growth/ev_{mult}"
        emb_dir = f"/tmp/s2growth/emb_{mult}"
        ev.write.mode("overwrite").parquet(f"{ev_dir}/events.parquet")
        emb.write.mode("overwrite").parquet(f"{emb_dir}/embeddings.parquet")
        ev.unpersist()
        emb.unpersist()

        vec = KM._vec(spark, emb_dir)
        timings = [
            ("kmeans", lambda: KM.kmeans_assign(vec)),
            ("semantic_dedup", lambda: KM.semantic_dedup(vec)),
            ("pagerank", lambda: q_event_pagerank(spark, ev_dir)),
            ("scd2", lambda: q_scd2_user_bands(spark, ev_dir)),
            ("grouping_sets", lambda: q_events_grouping_sets(spark, ev_dir)),
            ("rank_functions", lambda: q_events_rank_functions(spark, ev_dir)),
        ]
        for name, mk in timings:
            t0 = time.perf_counter()
            mk().write.format("noop").mode("overwrite").save()
            out[name] = round(time.perf_counter() - t0, 2)

        # holt/seasonal take the (ts, metric, value, seq) stream shape
        samples = load_table(spark, ev_dir, "events").select(
            "ts",
            F.col("event_type").alias("metric"),
            "value",
            F.col("event_id").alias("seq"),
        )
        for name, mk in [
            ("holt", lambda: holt_smoothing(samples)),
            ("seasonal", lambda: seasonal_anomaly(samples)),
        ]:
            t0 = time.perf_counter()
            mk().write.format("noop").mode("overwrite").save()
            out[name] = round(time.perf_counter() - t0, 2)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
