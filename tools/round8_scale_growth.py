"""Scale-growth experiment for the round-8 operators:

- ``corpus_bpe_encode`` — the fold chain runs once per DISTINCT word
  (vocabulary-scale memoization); the corpus-scale work is one
  distinct + one AQE-broadcast join + one keyed agg, so wall should
  track corpus bytes ~linearly while the encoded-vocab side stays
  near-flat.
- ``corpus_bpe_packing`` — encode + one doc-sharded window; ~linear.
- ``corpus_dup_span_removal`` — the span table is self-limiting
  (support >= 2 n-grams only): output volume must scale with
  duplicate MASS, not corpus².  The JSON records merged-span and
  removed-word totals beside the wall so the claim is measured.
- ``metric_dspot_threshold`` — one bounded-frame window + the two
  keyed SPOT aggs; ~linear in samples, flat per-series state.

Replication discipline: documents get distinct doc_ids + a per-copy
suffix token (so replicas are near- not exact-duplicates; every
internal n-gram span IS cross-copy duplicated — duplicate mass grows
linearly with the multiplier, the worst realistic case for the
removal pass); events get distinct event_ids + a small ts shift.
One JSON line per multiplier; recorded in BASELINE.md.

Usage: ``python tools/round8_scale_growth.py [mult ...]``
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
    from prometheus_anomaly_detection_lstm_spark.operators import bpe, text
    from prometheus_anomaly_detection_lstm_spark.plans import wave11
    from prometheus_anomaly_detection_lstm_spark.session import get_spark

    mults = [int(a) for a in sys.argv[1:]] or [1, 4, 10]
    spark = get_spark("round8-scale-growth")
    spark.sparkContext.setLogLevel("ERROR")
    sf = "/root/testdata/sf0.1"

    docs0 = load_table(spark, sf, "documents")
    ev0 = load_table(spark, sf, "events")

    for mult in mults:
        docs = functools.reduce(
            lambda a, b: a.unionByName(b),
            [
                docs0.withColumn(
                    "doc_id", F.col("doc_id") + F.lit(k * 100_000_000)
                ).withColumn(
                    "text",
                    F.concat(F.col("text"), F.lit(f" copyvariant{k}"))
                    if k > 0
                    else F.col("text"),
                )
                for k in range(mult)
            ],
        )
        ev = functools.reduce(
            lambda a, b: a.unionByName(b),
            [
                ev0.withColumn(
                    "event_id", F.col("event_id") + F.lit(k * 100_000_000)
                ).withColumn(
                    "ts", F.col("ts") + F.expr(f"INTERVAL {k * 7} SECONDS")
                )
                for k in range(mult)
            ],
        )
        root = f"/tmp/r8growth/{mult}"
        docs.write.mode("overwrite").parquet(f"{root}/documents.parquet")
        ev.write.mode("overwrite").parquet(f"{root}/events.parquet")
        out = {
            "mult": mult,
            "docs": load_table(spark, root, "documents").count(),
            "events": load_table(spark, root, "events").count(),
        }

        from prometheus_anomaly_detection_lstm_spark.operators import dedup

        timings = [
            ("bpe_encode", lambda: bpe.q_corpus_bpe_encode(spark, root)),
            ("bpe_packing", lambda: bpe.q_corpus_bpe_packing(spark, root)),
            ("dup_span_removal",
             lambda: text.q_dup_span_removal(spark, root)),
            ("dspot_threshold",
             lambda: wave11.q_metric_dspot_threshold(spark, root)),
            ("clean_tokenize_pack",
             lambda: bpe.q_corpus_clean_tokenize_pack(spark, root)),
            ("neardup_keep_best",
             lambda: dedup.q_neardup_keep_best(spark, root)),
        ]
        for name, mk in timings:
            t0 = time.perf_counter()
            mk().write.format("noop").mode("overwrite").save()
            out[name] = round(time.perf_counter() - t0, 2)

        # duplicate-mass evidence: merged spans / removed words must
        # grow ~linearly with the multiplier (duplicate mass), never
        # quadratically (corpus²)
        stats = (
            text.q_dup_span_removal(spark, root)
            .agg(
                F.sum("n_spans").alias("spans"),
                F.sum("n_words_removed").alias("words_removed"),
            )
            .collect()[0]
        )
        out["merged_spans"] = int(stats["spans"] or 0)
        out["words_removed"] = int(stats["words_removed"] or 0)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
