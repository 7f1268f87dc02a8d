"""Shuffle-volume audit: measured bytes MOVED per headline query.

Wall-clock at sf0.1 is overhead-dominated (BASELINE.md), so the number
that actually predicts 100 TB behavior is data movement: how many
bytes a query shuffles (and spills) per byte of input.  This harness
runs each headline query in its own Spark job group with event logging
on, then aggregates the per-task metrics from the event log:

    input bytes | shuffle write | shuffle read | memory/disk spill

A query whose shuffle bytes are a small fraction of its input scans
scales with the network it has; one that re-shuffles its input
repeatedly does not.  Results recorded in BASELINE.md.

Usage: ``python tools/shuffle_audit.py [sf_dir]``
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    "tpch_q1", "tpch_q3", "tpch_q3_bucketed", "tpch_q5",
    "windowed_events", "dedup_exact", "dedup_minhash_lsh",
    "ann_cosine_topk", "ann_cosine_topk_lsh", "text_quality_scores",
    "anomaly_mse", "semantic_dedup_scaled", "promql_holt_smoothing",
    "metric_glr_changepoint", "events_ab_sequential",
]


def main() -> None:
    from pyspark.sql import SparkSession

    from prometheus_anomaly_detection_lstm_spark.registry import all_queries

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    log_dir = "/tmp/sg_eventlog"
    import shutil

    shutil.rmtree(log_dir, ignore_errors=True)
    os.makedirs(log_dir, exist_ok=True)

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .appName("shuffle-audit")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_DRIVER_MEMORY", "16g"),
        )
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", f"file://{log_dir}")
        .config("spark.eventLog.compress", "false")
        .config("spark.eventLog.rolling.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    queries = all_queries()

    for name in QUERIES:
        sc.setJobGroup(name, name)
        queries[name][0](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
    sc.setJobGroup("done", "done")
    spark.stop()  # flushes the event log

    # ---- parse: job group -> jobs -> stages -> task metric sums ----
    # Spark 4 writes the v2 rolling layout: a DIRECTORY per app with
    # events_* files inside; v1 is a single file.  Collect both.
    logs: list[str] = []
    for entry in os.listdir(log_dir):
        p = os.path.join(log_dir, entry)
        if os.path.isdir(p):
            logs += sorted(
                os.path.join(p, f)
                for f in os.listdir(p)
                if f.startswith("events")
            )
        else:
            logs.append(p)
    stage_group: dict[int, str] = {}
    agg: dict[str, dict[str, int]] = {
        q: dict(input=0, sh_write=0, sh_read=0, mem_spill=0, disk_spill=0)
        for q in QUERIES
    }
    def _lines():
        for path in logs:
            with open(path) as fh:
                yield from fh

    if True:
        for line in _lines():
            ev = json.loads(line)
            kind = ev.get("Event")
            if kind == "SparkListenerJobStart":
                group = (ev.get("Properties") or {}).get(
                    "spark.jobGroup.id"
                )
                if group in agg:
                    for sid in ev.get("Stage IDs", []):
                        stage_group[int(sid)] = group
            elif kind == "SparkListenerTaskEnd":
                group = stage_group.get(int(ev.get("Stage ID", -1)))
                if group is None:
                    continue
                m = ev.get("Task Metrics") or {}
                a = agg[group]
                a["input"] += (m.get("Input Metrics") or {}).get(
                    "Bytes Read", 0
                )
                a["sh_write"] += (
                    m.get("Shuffle Write Metrics") or {}
                ).get("Shuffle Bytes Written", 0)
                rd = m.get("Shuffle Read Metrics") or {}
                a["sh_read"] += rd.get("Local Bytes Read", 0) + rd.get(
                    "Remote Bytes Read", 0
                )
                a["mem_spill"] += m.get("Memory Bytes Spilled", 0)
                a["disk_spill"] += m.get("Disk Bytes Spilled", 0)

    def mb(x: int) -> float:
        return round(x / 1e6, 3)

    out = {}
    # NOTE: input MB is COMPRESSED, column-pruned scan bytes (that is
    # the point — pruning works), so shuffle/input ratios are not
    # meaningful; the informative column is read/write ("reuse x"): a
    # factor > 1 means one shuffle write feeds multiple consumers
    # (ReuseExchange), the cheapest kind of shuffle there is.
    print(f"{'query':28s} {'scan MB':>9s} {'shufW MB':>9s} "
          f"{'shufR MB':>9s} {'spill MB':>9s} {'reuse x':>9s}")
    for q in QUERIES:
        a = agg[q]
        reuse = (
            round(a["sh_read"] / a["sh_write"], 2)
            if a["sh_write"]
            else 0.0
        )
        print(
            f"{q:28s} {mb(a['input']):>9.3f} {mb(a['sh_write']):>9.3f} "
            f"{mb(a['sh_read']):>9.3f} "
            f"{mb(a['mem_spill'] + a['disk_spill']):>9.3f} {reuse:>9.2f}"
        )
        out[q] = {
            "scan_mb": mb(a["input"]),
            "shuffle_write_mb": mb(a["sh_write"]),
            "shuffle_read_mb": mb(a["sh_read"]),
            "spill_mb": mb(a["mem_spill"] + a["disk_spill"]),
            "read_over_write": reuse,
        }
    print(json.dumps({"sf_dir": sf_dir, "queries": out}))


if __name__ == "__main__":
    main()
