"""Repeated-scan audit: flag queries whose executed plan scans the
same parquet table >= 3 times.

A repeated scan is a HINT, not a verdict: self-joins (basket affinity,
dedup pairs) and independent stat/stream passes (BM25's stats +
postings) legitimately re-read a table.  The disease this hunts is the
two-consumer DEEP SUBTREE — a derived frame (tf, tf-idf postings, the
anomaly prep chain) consumed by two downstream operators, which
Catalyst executes once PER CONSUMER because column pruning specializes
each copy's scan and defeats ReuseExchange.  Round-11 fixes from this
audit: feature_hashing / tfidf / bm25 df-as-window (scans 3 -> 2 each),
and the anomaly family's day_counts injection (12 -> 8).  The
frame-fusion A/B (BASELINE.md) is the counterexample: removing an
exchange is NOT worth CREATING a second consumer.

Run: python tools/scan_audit.py [--sf DIR] [--min N]
"""

from __future__ import annotations

import collections
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf = "/root/testdata/sf0.01"
    min_scans = 3
    args = sys.argv[1:]
    if "--sf" in args:
        sf = args[args.index("--sf") + 1]
    if "--min" in args:
        min_scans = int(args[args.index("--min") + 1])

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    rows = []
    for name, fn in entry.queries().items():
        try:
            plan = (
                fn(spark, sf)._jdf.queryExecution().executedPlan().toString()
            )
        except Exception as ex:  # noqa: BLE001 - audit keeps going
            print(f"{name}: ERROR {str(ex)[:100]}")
            continue
        tables = re.findall(r"Scan parquet[^\n]*?(\w+)\.parquet", plan)
        counts = collections.Counter(tables)
        worst = max(counts.values()) if counts else 0
        if worst >= min_scans:
            rows.append((worst, sum(counts.values()), name, dict(counts)))
    rows.sort(reverse=True)
    for worst, total, name, counts in rows:
        print(f"{name}: max-per-table {worst}, total {total}, {counts}")
    print(f"-- {len(rows)} queries at >= {min_scans} scans of one table")


if __name__ == "__main__":
    main()
