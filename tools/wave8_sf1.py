"""sf1 crossover for the wave8 family (continuation-4).

Reuses the /tmp/crossover/sf1 dataset built by ``sf1_crossover.py gen``
(sf0.1 replicated 10x with distinct keys) and times each hash-graded
wave8 query on BOTH engines — the Spark registry callable (best-of-3
noop walls after a warm pass) vs its own DuckDB oracle SQL verbatim
(best-of-3, all cores).  Usage::

    python tools/sf1_crossover.py gen      # once
    python tools/wave8_sf1.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF1 = "/tmp/crossover/sf1"
NAMES = [
    "join_key_skew_profile",
    "metric_sax_symbols",
    "metric_sax_motifs",
    "text_pmi_collocations",
    "embedding_hard_negatives",
    "embedding_centroid_drift",
]


def main() -> None:
    import duckdb

    from prometheus_anomaly_detection_lstm_spark.registry import all_queries
    from prometheus_anomaly_detection_lstm_spark.session import get_spark

    qs = all_queries()
    spark = get_spark("wave8-sf1")
    spark.sparkContext.setLogLevel("ERROR")

    spark_t = {}
    for name in NAMES:
        fn, _ = qs[name]
        df = fn(spark, SF1)
        df.write.format("noop").mode("overwrite").save()  # warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        spark_t[name] = round(best, 3)
        print(f"spark {name}: {spark_t[name]}", flush=True)

    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        # gen writes Spark directory outputs: glob the part files
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF1}/{t}.parquet/*.parquet'"
        )
    duck_t = {}
    for name in NAMES:
        _, sql = qs[name]
        con.execute(sql).fetchall()  # warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            best = min(best, time.perf_counter() - t0)
        duck_t[name] = round(best, 3)
        print(f"duck  {name}: {duck_t[name]}", flush=True)

    out = {
        name: {
            "spark": spark_t[name],
            "duck": duck_t[name],
            "ratio": round(spark_t[name] / duck_t[name], 2),
        }
        for name in NAMES
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
