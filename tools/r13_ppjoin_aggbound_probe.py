"""Pair-aggregated PPJoin bound probe (round-13 NEGATIVE result).

Measures, for ngram_jaccard_pairs and containment_pairs, how many
candidate pairs the pair-AGGREGATED PPJoin bound would remove beyond
the landed per-row positional/length filters:

    o_p + min(|A| - max_rn_a, |B| - max_rn_b) >= tau

where o_p is the pair's prefix-join row count and (max_rn_a, max_rn_b)
are the ranks of the pair's globally-LAST common prefix shingle.  The
bound is EXACT: (1) rank order-consistency — every common shingle
globally smaller than the last common prefix shingle has smaller rank
on both sides, hence lies inside both prefixes and is already counted
in o_p, so all uncounted common shingles rank after (max_rn_a,
max_rn_b) on BOTH sides; (2) the landed per-row filter's bound
decreases monotonically along the global order, so it only truncates
pair tails and aggregating over kept rows keeps the upper bound valid.

Measured on this corpus (sf0.1): prunes 0 of 689,632 jaccard
candidates and 0 of 660,346 containment candidates.  Structural
reason: for any prefix join row the A-side allowance is already
>= ceil(t*|A|) - 1 by the prefix-length definition, so only the B-side
rank term can prune, and shared shingles here are rare, hence rank
EARLY in both docs under the rarest-first order.  NOT landed: same
shuffle as .distinct(), wider aggregate state, zero pruning.

Usage: SPARK_GRAFT_SF_DIR=... python tools/r13_ppjoin_aggbound_probe.py {jaccard|containment}
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "jaccard"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_DRIVER_MEMORY", "16g"),
        )
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from prometheus_anomaly_detection_lstm_spark.functions.checkpoint import (
        cut_lineage,
    )
    from prometheus_anomaly_detection_lstm_spark.operators.dedup import (
        CONTAINMENT_THRESHOLD,
        JACCARD_THRESHOLD,
        _docs,
        containment_pairs,
        ngram_jaccard_pairs,
        shingles,
    )

    sh = shingles(_docs(spark, sf_dir)).transform(cut_lineage)
    dfreq = sh.groupBy("shingle").agg(F.count("*").alias("__df"))
    w_doc = Window.partitionBy("doc_id").orderBy("__df", "shingle")
    ranked = (
        sh.join(dfreq, "shingle")
        .withColumn("__rn", F.row_number().over(w_doc))
        .withColumn("__n", F.count("*").over(Window.partitionBy("doc_id")))
    ).transform(cut_lineage)

    if which == "jaccard":
        t = JACCARD_THRESHOLD
        prefix = ranked.filter(
            F.col("__rn")
            <= F.col("__n") - F.ceil(F.lit(t) * F.col("__n") - F.lit(1e-9)) + 1
        )
        pa = prefix.select(
            F.col("doc_id").alias("doc_a"), "shingle",
            F.col("__rn").alias("__rn_a"), F.col("__n").alias("__n_a"))
        pb = prefix.select(
            F.col("doc_id").alias("doc_b"), "shingle",
            F.col("__rn").alias("__rn_b"), F.col("__n").alias("__n_b"))
        rows = (
            pa.join(pb, "shingle")
            .filter(F.col("doc_a") < F.col("doc_b"))
            .filter(
                (F.col("__n_b") >= F.ceil(F.lit(t) * F.col("__n_a") - F.lit(1e-9)))
                & (F.col("__n_a") >= F.ceil(F.lit(t) * F.col("__n_b") - F.lit(1e-9)))
            )
            .filter(
                F.lit(1)
                + F.least(
                    F.col("__n_a") - F.col("__rn_a"),
                    F.col("__n_b") - F.col("__rn_b"),
                )
                >= F.ceil(
                    F.lit(t) / F.lit(1.0 + t)
                    * (F.col("__n_a") + F.col("__n_b"))
                    - F.lit(1e-9)
                )
            )
        )
        tau = F.ceil(
            F.lit(t) / F.lit(1.0 + t) * (F.col("__na") + F.col("__nb"))
            - F.lit(1e-9)
        )
        out = ngram_jaccard_pairs(_docs(spark, sf_dir)).select("doc_a", "doc_b")
    else:
        t = CONTAINMENT_THRESHOLD
        prefix = ranked.filter(
            F.col("__rn")
            <= F.col("__n") - F.ceil(F.lit(t) * F.col("__n") - F.lit(1e-9)) + 1
        ).select(
            F.col("doc_id").alias("doc_a"), "shingle",
            F.col("__rn").alias("__rn_a"), F.col("__n").alias("__n_a"))
        bstream = ranked.select(
            F.col("doc_id").alias("doc_b"), "shingle",
            F.col("__rn").alias("__rn_b"), F.col("__n").alias("__n_b"))
        rows = (
            prefix.join(bstream, "shingle")
            .filter(F.col("doc_a") != F.col("doc_b"))
            .filter(
                F.lit(1)
                + F.least(
                    F.col("__n_a") - F.col("__rn_a"),
                    F.col("__n_b") - F.col("__rn_b"),
                )
                >= F.ceil(F.lit(t) * F.col("__n_a") - F.lit(1e-9))
            )
        )
        tau = F.ceil(F.lit(t) * F.col("__na") - F.lit(1e-9))
        out = containment_pairs(_docs(spark, sf_dir)).select("doc_a", "doc_b")

    n_current = rows.select("doc_a", "doc_b").distinct().count()
    agg = (
        rows.groupBy("doc_a", "doc_b")
        .agg(
            F.count("*").alias("__op"),
            F.max("__rn_a").alias("__mra"),
            F.max("__rn_b").alias("__mrb"),
            F.max("__n_a").alias("__na"),
            F.max("__n_b").alias("__nb"),
        )
        .filter(
            F.col("__op")
            + F.least(
                F.col("__na") - F.col("__mra"), F.col("__nb") - F.col("__mrb")
            )
            >= tau
        )
    )
    n_agg = agg.count()
    missing = out.join(
        agg.select("doc_a", "doc_b"), ["doc_a", "doc_b"], "left_anti"
    ).count()
    print(
        json.dumps(
            {
                "which": which,
                "sf_dir": sf_dir,
                "threshold": t,
                "cands_current": n_current,
                "cands_aggbound": n_agg,
                "reduction": round(1 - n_agg / max(n_current, 1), 4),
                "output_pairs_missing_from_aggbound": missing,
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
