"""Benchmark headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "...", "value": <total_sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>}

Each query is forced end-to-end with a noop write (full computation,
no driver-side collect overhead).  Queries run once after a shared-
session warmup; wall time includes Catalyst planning.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from prometheus_anomaly_detection_lstm_spark.registry import all_queries
from prometheus_anomaly_detection_lstm_spark.session import get_spark

HEADLINE = [
    "anomaly_mse",
    "minmax_scaled",
    "threshold_split",
    "tpch_q1",
    "tpch_q3",
    "tpch_q5",
    "windowed_events",
    "dedup_exact",
    "dedup_minhash_lsh",
    "ann_cosine_topk",
    "text_quality_scores",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")
    queries = all_queries()

    # warmup: JVM JIT + whole-stage-codegen compile + parquet footer
    # caches, not measured — run the flagship pipeline at the smallest
    # sf plus one relational query so compiled plans are hot.
    queries["anomaly_flags"][0](spark, "/root/testdata/sf0.001").write.format(
        "noop"
    ).mode("overwrite").save()
    queries["tpch_q6"][0](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn, _ = queries[name]
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline query wall time (noop write, local)",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
            }
        )
    )


if __name__ == "__main__":
    main()
