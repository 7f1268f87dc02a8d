"""Scale-growth experiment for the round-5 additions (bm25 /
matryoshka eval / edit-distance dedup).

Same method as the earlier growth harnesses: replicate the sf0.1
inputs N× with DISTINCT keys (doc ids offset with per-copy text suffix
so shingle/fingerprint spaces grow; vec ids offset) and time each new
shape end-to-end with a noop sink.  Near-linear wall growth = no
hidden super-linear stage.  Usage::

    python tools/round5_scale_growth.py [mult ...]   # default 1 4 10
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _rep(df, mult, build):
    return functools.reduce(
        lambda a, b: a.unionByName(b), [build(df, k) for k in range(mult)]
    )


def main() -> None:
    from pyspark.sql import functions as F

    from prometheus_anomaly_detection_lstm_spark.io_tables import load_table
    from prometheus_anomaly_detection_lstm_spark.operators.dedup import (
        edit_distance_near_dups,
    )
    from prometheus_anomaly_detection_lstm_spark.operators.similarity import (
        matryoshka_overlap_eval,
    )
    from prometheus_anomaly_detection_lstm_spark.operators.text import (
        bm25_topk,
        nb_train_score,
        score_auc,
    )
    from prometheus_anomaly_detection_lstm_spark.operators.linalg import (
        logreg_fit,
    )
    from prometheus_anomaly_detection_lstm_spark.session import get_spark

    mults = [int(a) for a in sys.argv[1:]] or [1, 4, 10]
    spark = get_spark("round5-scale-growth")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    sf = "/root/testdata/sf0.1"
    docs0 = load_table(spark, sf, "documents")
    emb0 = load_table(spark, sf, "embeddings")
    off = 1_000_000_000

    for mult in mults:
        docs = _rep(
            docs0,
            mult,
            lambda d, k: d.withColumn(
                "doc_id", F.col("doc_id") + F.lit(k * off)
            ).withColumn(
                "text",
                F.col("text")
                if k == 0
                else F.concat(F.col("text"), F.lit(f" copyvariant{k}")),
            ),
        )
        emb = _rep(
            emb0,
            mult,
            lambda d, k: d.withColumn(
                "vec_id", F.col("vec_id") + F.lit(k * off)
            ),
        )
        # materialize the replicated inputs so every timed shape reads
        # the same pre-split files (matches the other harnesses)
        droot = f"/tmp/r5growth/m{mult}"
        docs.repartition(16).write.mode("overwrite").parquet(f"{droot}/docs")
        emb.repartition(16).write.mode("overwrite").parquet(f"{droot}/emb")
        docs = spark.read.parquet(f"{droot}/docs")
        emb = spark.read.parquet(f"{droot}/emb")

        shapes = {
            "bm25": lambda: bm25_topk(docs),
            "matryoshka": lambda: matryoshka_overlap_eval(emb),
            "edit_distance": lambda: edit_distance_near_dups(docs),
            "nb_classifier": lambda: nb_train_score(docs),
            "nb_auc": lambda: score_auc(
                nb_train_score(docs), "nb_score", "is_pos"
            ),
        }
        timings = {}
        for name, build in shapes.items():
            df = build()
            df.write.format("noop").mode("overwrite").save()  # warm
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            timings[name] = round(best, 3)
        # logreg is driver-looped (one distributed pass per iteration),
        # so time the call itself, not a noop write of its output
        lr_emb = emb.select(
            "embedding", (F.col("label") == 0).cast("double").alias("y")
        )
        logreg_fit(lr_emb, iters=5)  # warm
        t0 = time.perf_counter()
        logreg_fit(lr_emb, iters=5)
        timings["logreg_5iter"] = round(time.perf_counter() - t0, 3)
        print(
            json.dumps(
                {"mult": mult, "docs": docs.count(), "queries": timings}
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
