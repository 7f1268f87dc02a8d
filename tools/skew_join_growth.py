"""Skewed-key join study: plain SMJ vs AQE skew-split vs manual salt.

Synthesizes an events fact table where ONE user owns ``HOT_SHARE`` of
all rows (the pathological celebrity/bot key) joined to a per-user dim
table, and measures three physical strategies at growing scale:

1. plain sort-merge join with AQE skew handling DISABLED — the
   worst case: the hot key's rows land in one task;
2. the same join with AQE skew handling ON (session default) — the
   first line of defense, runtime partition splitting;
3. operators/skew.salted_join — the manual fallback for plans AQE
   cannot rewrite (stateful/streaming joins), deterministic salt.

Answer identity is asserted before any timing.  Usage::

    python tools/skew_join_growth.py [mult ...]    # default 1 4 10
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HOT_SHARE = 0.5
N_USERS = 50_000
BASE_ROWS = 500_000


def main() -> None:
    from pyspark.sql import functions as F

    from prometheus_anomaly_detection_lstm_spark.operators.skew import (
        salted_join,
    )
    from prometheus_anomaly_detection_lstm_spark.session import get_spark

    mults = [int(a) for a in sys.argv[1:]] or [1, 4, 10]
    spark = get_spark("skew-join-growth")
    spark.sparkContext.setLogLevel("ERROR")

    for mult in mults:
        n = BASE_ROWS * mult
        droot = f"/tmp/skewgrowth/m{mult}"
        # fact: user 0 owns HOT_SHARE of the rows, the rest uniform
        fact = (
            spark.range(n)
            .select(
                F.col("id").alias("row_id"),
                F.when(
                    F.pmod(F.hash("id"), F.lit(1000))
                    < int(HOT_SHARE * 1000),
                    F.lit(0),
                )
                .otherwise(F.pmod(F.hash("id", F.lit(7)), F.lit(N_USERS)))
                .alias("user_id"),
                (F.pmod(F.hash("id", F.lit(13)), F.lit(1000)) / 10.0).alias(
                    "value"
                ),
            )
        )
        dim = spark.range(N_USERS).select(
            F.col("id").alias("user_id"),
            F.pmod(F.hash("id", F.lit(3)), F.lit(10)).alias("segment"),
        )
        fact.write.mode("overwrite").parquet(f"{droot}/fact")
        dim.write.mode("overwrite").parquet(f"{droot}/dim")
        fact = spark.read.parquet(f"{droot}/fact")
        dim = spark.read.parquet(f"{droot}/dim")

        def agg(j):
            return j.groupBy("segment").agg(
                F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("v")
            )

        def no_bhj(df):
            # force the shuffle join path (the skew surface under test —
            # a broadcast of the dim would dodge the comparison)
            return df.hint("merge")

        plain = agg(fact.join(no_bhj(dim), "user_id"))
        salted = agg(salted_join(fact, dim.hint("merge"), "user_id", 16))
        # answer identity first
        assert plain.exceptAll(salted).count() == 0
        assert salted.exceptAll(plain).count() == 0

        timings = {}
        for name, df, skew_flag in [
            ("smj_no_aqe_skew", plain, "false"),
            ("smj_aqe_skew", plain, "true"),
            ("salted_16", salted, "false"),
        ]:
            spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skew_flag)
            df.write.format("noop").mode("overwrite").save()  # warm
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            timings[name] = round(best, 3)
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        print(
            json.dumps({"mult": mult, "rows": n, "queries": timings}),
            flush=True,
        )


if __name__ == "__main__":
    main()
