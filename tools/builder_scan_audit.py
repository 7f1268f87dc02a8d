"""Builder-inclusive repeated-scan audit (round-13, verdict task 3).

The round-12 scan gates count `Scan parquet` nodes in a query's
executed plan, but every checkpoint truncates its subtree to
`Scan ExistingRDD` — scans *below* a checkpoint are invisible there.
This audit rebuilds each gated query under
`functions.checkpoint.capture_builders()` and counts scans in the
query's own executed plan PLUS each captured builder frame's executed
plan (pre-truncation), giving the true number of table scans one
end-to-end execution performs.

Run: python tools/builder_scan_audit.py [--sf DIR] [--names a,b,c]
"""

from __future__ import annotations

import collections
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCAN_RE = re.compile(r"Scan parquet[^\n]*?(\w+)\.parquet")


def combined_scans(spark, fn, sf: str) -> tuple[dict, int]:
    """(per-table scan counts across query+builders, n_builders)."""
    from prometheus_anomaly_detection_lstm_spark.functions.checkpoint import (
        capture_builders,
    )

    with capture_builders() as builders:
        df = fn(spark, sf)
    counts: collections.Counter = collections.Counter()
    plans = [df] + list(builders)
    for frame in plans:
        plan = frame._jdf.queryExecution().executedPlan().toString()
        # an EXECUTED AdaptiveSparkPlan prints "== Final Plan ==" AND
        # "== Initial Plan ==" — counting both double-counts scans
        plan = plan.split("== Initial Plan ==")[0]
        counts.update(SCAN_RE.findall(plan))
    return dict(counts), len(builders)


def main() -> None:
    sf = "/root/testdata/sf0.001"
    names = None
    args = sys.argv[1:]
    if "--sf" in args:
        sf = args[args.index("--sf") + 1]
    if "--names" in args:
        names = args[args.index("--names") + 1].split(",")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from prometheus_anomaly_detection_lstm_spark.registry import all_queries
    from tests.test_scan_gates import GATES

    targets = names or sorted(GATES)
    reg = all_queries()
    for name in targets:
        try:
            counts, n_builders = combined_scans(spark, reg[name][0], sf)
        except Exception as ex:  # noqa: BLE001 - audit keeps going
            print(f"{name}: ERROR {str(ex)[:120]}")
            continue
        worst = max(counts.values()) if counts else 0
        print(
            f"{name}: builders={n_builders} max-per-table {worst} {counts}"
        )


if __name__ == "__main__":
    main()
