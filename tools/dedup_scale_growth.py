"""Scale-growth experiment: dedup/corpus operators vs corpus volume.

Replicates the sf0.1 documents table N times with DISTINCT doc ids and
perturbed text (a per-copy suffix token on every doc — new shingles, so
the shingle/posting-list distributions grow realistically instead of
producing N-way exact duplicates), then times the heavyweight corpus
operators end-to-end.  Prints one JSON line per multiplier; results
recorded in BASELINE.md.  Usage: ``python tools/dedup_scale_growth.py
[mult ...]``.
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

    from prometheus_anomaly_detection_lstm_spark.operators import corpus, dedup
    from prometheus_anomaly_detection_lstm_spark.io_tables import load_table
    from prometheus_anomaly_detection_lstm_spark.session import get_spark

    mults = [int(a) for a in sys.argv[1:]] or [1, 4, 10]
    spark = get_spark("dedup-scale-growth")
    spark.sparkContext.setLogLevel("ERROR")
    docs0 = load_table(spark, "/root/testdata/sf0.1", "documents").select(
        "doc_id", "text", "source"
    )
    for mult in mults:
        copies = [
            docs0.withColumn(
                "doc_id", F.col("doc_id") + F.lit(k * 100_000_000)
            ).withColumn(
                "text", F.concat(F.col("text"), F.lit(f" copytag{k}"))
            )
            for k in range(mult)
        ]
        big = functools.reduce(lambda a, b: a.unionByName(b), copies)
        big = big.persist()
        n = big.count()  # materialize the input outside the timings
        out = {"mult": mult, "docs": n}
        for name, mk in [
            ("minhash_lsh", lambda: dedup.minhash_lsh_dedup(big)),
            ("simhash_pairs", lambda: dedup.simhash_near_pairs(big, max_hamming=3)),
            ("decontaminate", lambda: corpus.decontaminate(big)),
            ("shuffle_shards", lambda: corpus.shuffle_shards(big)),
        ]:
            t0 = time.perf_counter()
            mk().write.format("noop").mode("overwrite").save()
            out[name] = round(time.perf_counter() - t0, 2)
        big.unpersist()
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
