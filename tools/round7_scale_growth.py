"""Scale-growth experiment for the round-7 wave-11 operators:

- ``text_lang_id_ngram`` — model is charset^3-bounded (vocabulary
  scale); training/scoring are one keyed agg each over the trigram
  stream, so wall should track corpus bytes ~linearly.
- ``corpus_perplexity_filter`` — same trigram rollup + a doc-count
  percentile; ~linear in corpus bytes.
- ``metric_spot_threshold`` — two keyed aggregates over samples +
  series-cardinality closed-form math; ~linear in samples with flat
  per-series state.

Replication discipline: documents get distinct doc_ids + a per-copy
suffix token (trigram vocabulary grows mildly, no degenerate
exact-duplicate corpus); events get distinct event_ids + a small ts
shift (samples-per-series grows, series count fixed — the production
shape).  One JSON line per multiplier; recorded in BASELINE.md.

Usage: ``python tools/round7_scale_growth.py [mult ...]``
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
    from prometheus_anomaly_detection_lstm_spark.plans import wave11
    from prometheus_anomaly_detection_lstm_spark.session import get_spark

    mults = [int(a) for a in sys.argv[1:]] or [1, 4, 10]
    spark = get_spark("round7-scale-growth")
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
        root = f"/tmp/r7growth/{mult}"
        docs.write.mode("overwrite").parquet(f"{root}/documents.parquet")
        ev.write.mode("overwrite").parquet(f"{root}/events.parquet")
        out = {
            "mult": mult,
            "docs": load_table(spark, root, "documents").count(),
            "events": load_table(spark, root, "events").count(),
        }

        timings = [
            ("lang_id_ngram",
             lambda: wave11.q_text_lang_id_ngram(spark, root)),
            ("perplexity_filter",
             lambda: wave11.q_corpus_perplexity_filter(spark, root)),
            ("spot_threshold",
             lambda: wave11.q_metric_spot_threshold(spark, root)),
        ]
        for name, mk in timings:
            t0 = time.perf_counter()
            mk().write.format("noop").mode("overwrite").save()
            out[name] = round(time.perf_counter() - t0, 2)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
