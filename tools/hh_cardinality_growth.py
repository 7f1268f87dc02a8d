"""Heavy-hitters strategy crossover vs KEY CARDINALITY.

The sf1 crossover table records the honest small-cardinality verdict:
with ~1.5k distinct users a plain group-by beats the Misra-Gries
sketch+rescan by 50×.  This harness measures the other axis — the one
the sketch exists for: fixed row volume, growing distinct-key count
(Zipf-distributed so heavy hitters exist at every cardinality).

exact  = groupBy(user_id).count().filter(cnt >= phi*n)   — aggregation
         state and shuffle volume grow with the DISTINCT-KEY count;
sketch = robust.heavy_hitters                            — per-partition
         state capped at MG_K counters; the shuffle carries only
         candidate ids + the rescan's counts.

Usage: python tools/hh_cardinality_growth.py [n_rows]   (default 10M)
Prints one JSON line per cardinality; recorded in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F

    from prometheus_anomaly_detection_lstm_spark.plans import robust
    from prometheus_anomaly_detection_lstm_spark.session import get_spark

    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    spark = get_spark("hh-cardinality")
    spark.sparkContext.setLogLevel("ERROR")

    for card in (1_000, 100_000, 5_000_000):
        # Zipf-ish keys: rank = floor(card ** u), u ~ U(0,1) — heavy
        # head at every cardinality, seeded => reproducible
        path = f"/tmp/hhgrowth/n{n_rows}_c{card}"
        if not os.path.exists(path):
            (
                spark.range(n_rows)
                .select(
                    F.floor(
                        F.pow(
                            F.lit(float(card)),
                            F.rand(seed=42),
                        )
                    ).cast("long").alias("user_id")
                )
                .repartition(32)
                .write.mode("overwrite")
                .parquet(path)
            )
        ev = spark.read.parquet(path)
        n = ev.count()
        phi = robust.HH_PHI

        def time_best(build, reps=3):
            build().write.format("noop").mode("overwrite").save()  # warm
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                build().write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            return round(best, 3)

        exact = lambda: (
            ev.groupBy("user_id")
            .agg(F.count("*").alias("cnt"))
            .filter(F.col("cnt") >= phi * n)
        )
        sketch = lambda: robust.heavy_hitters(ev)
        distinct = ev.select("user_id").distinct().count()
        print(
            json.dumps(
                {
                    "cardinality_target": card,
                    "distinct_actual": distinct,
                    "rows": n,
                    "exact_s": time_best(exact),
                    "sketch_s": time_best(sketch),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
