"""dedup_ngram_jaccard PPJoin A/B (round-13 deferred-item landing).

Interleaved full-cost (construct+execute) A/B at $SPARK_GRAFT_SF_DIR:
arm OLD is a verbatim copy of the pre-r13 candidate generation
(prefix x prefix equi-join, no positional/length filter); arm NEW is
the library ``ngram_jaccard_pairs``.  noop sink, job labels, median
over interleaved passes; sorted-rows equality asserted FIRST.

Usage: SPARK_GRAFT_SF_DIR=... python tools/r13_jaccard_ab.py [passes]
  env JACCARD_AB_PLAN=1   -> also dump .explain('formatted') per arm
  env JACCARD_AB_EQ_ONLY=1 -> equality check only (no timing)
  env JACCARD_AB_SKIP_EQ=1 -> timing only (equality proven in a prior
    invocation at the same SF dir; the sf1 eq collect alone runs ~30
    min, so the timing rerun must be able to skip it)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def old_ngram_jaccard_pairs(docs: DataFrame, threshold: float) -> DataFrame:
    """Pre-r13 shape: prefix x prefix join, no positional/length filter."""
    from prometheus_anomaly_detection_lstm_spark.operators.dedup import (
        shingles,
    )
    from prometheus_anomaly_detection_lstm_spark.functions.checkpoint import (
        cut_lineage,
    )

    sh = shingles(docs).transform(cut_lineage)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    dfreq = sh.groupBy("shingle").agg(F.count("*").alias("__df"))
    w_doc = Window.partitionBy("doc_id").orderBy("__df", "shingle")
    ranked = (
        sh.join(dfreq, "shingle")
        .withColumn("__rn", F.row_number().over(w_doc))
        .withColumn("__n", F.count("*").over(Window.partitionBy("doc_id")))
    )
    prefix = ranked.filter(
        F.col("__rn")
        <= F.col("__n")
        - F.ceil(F.lit(threshold) * F.col("__n") - F.lit(1e-9))
        + 1
    ).select("doc_id", "shingle")
    cands = (
        prefix.alias("pa")
        .join(prefix.alias("pb"), "shingle")
        .filter(F.col("pa.doc_id") < F.col("pb.doc_id"))
        .select(
            F.col("pa.doc_id").alias("doc_a"),
            F.col("pb.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        cands.join(a, "doc_a")
        .join(b, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    out = (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return out.select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))


def main() -> None:
    sf_dir = os.environ["SPARK_GRAFT_SF_DIR"]
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config(
            "spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g")
        )
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from prometheus_anomaly_detection_lstm_spark.operators.dedup import (
        JACCARD_THRESHOLD,
        _docs,
        ngram_jaccard_pairs,
    )

    def mk_old() -> DataFrame:
        return old_ngram_jaccard_pairs(_docs(spark, sf_dir), JACCARD_THRESHOLD)

    def mk_new() -> DataFrame:
        return ngram_jaccard_pairs(_docs(spark, sf_dir))

    # --- equality first (sorted rows, full frames) ---
    if os.environ.get("JACCARD_AB_SKIP_EQ"):
        ra = rb = []
        eq = True
    else:
        ra = sorted(map(tuple, mk_old().collect()))
        rb = sorted(map(tuple, mk_new().collect()))
        eq = ra == rb
        print(
            json.dumps(
                {"equal": eq, "rows_old": len(ra), "rows_new": len(rb)},
            ),
            flush=True,
        )
    if not eq:
        only_a = set(ra) - set(rb)
        only_b = set(rb) - set(ra)
        print("ONLY_OLD", list(only_a)[:5])
        print("ONLY_NEW", list(only_b)[:5])
        sys.exit(1)
    if os.environ.get("JACCARD_AB_EQ_ONLY"):
        spark.stop()
        return

    if os.environ.get("JACCARD_AB_PLAN"):
        jvm = spark.sparkContext._jvm
        for tag, mk in (("old", mk_old), ("new", mk_new)):
            txt = jvm.PythonSQLUtils.explainString(
                mk()._jdf.queryExecution(), "formatted"
            )
            with open(f"/tmp/jaccard_plan_{tag}.txt", "w") as fh:
                fh.write(txt)

    def full_cost(tag: str, mk) -> float:
        sc = spark.sparkContext
        sc.setJobDescription(f"jaccard_ab:{tag}")
        try:
            t0 = time.monotonic()
            mk().write.format("noop").mode("overwrite").save()
            return time.monotonic() - t0
        finally:
            sc.setJobDescription(None)

    # warm both arms once
    full_cost("warm_old", mk_old)
    full_cost("warm_new", mk_new)
    ts_old, ts_new = [], []
    for i in range(passes):
        ts_old.append(full_cost(f"old_{i}", mk_old))
        print(f"pass {i} old {ts_old[-1]:.3f}", flush=True)
        ts_new.append(full_cost(f"new_{i}", mk_new))
        print(f"pass {i} new {ts_new[-1]:.3f}", flush=True)
    res = json.dumps(
        {
            "sf_dir": sf_dir,
            "passes": passes,
            "old": ts_old,
            "new": ts_new,
            "old_median": statistics.median(ts_old),
            "new_median": statistics.median(ts_new),
        }
    )
    print(res, flush=True)
    with open("/tmp/jaccard_ab_result.json", "w") as fh:
        fh.write(res + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
