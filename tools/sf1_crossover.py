"""sf1 crossover experiment (round-3 verdict task 3).

BASELINE.md argues the 6.4x gap to the DuckDB anchor at sf0.1 is fixed
per-stage overhead and the crossover sits near sf1; this measures it.

    python tools/sf1_crossover.py gen     # build /tmp/crossover/sf1
    python tools/sf1_crossover.py duck    # time DuckDB on it
    SPARK_GRAFT_SF_DIR=/tmp/crossover/sf1 python bench.py   # Spark side

``gen`` replicates the sf0.1 tables 10x with DISTINCT keys so join
fan-outs, group cardinalities and duplicate-group sizes grow
realistically (orderkeys/event ids/doc ids/vec ids offset per copy;
document text gets a per-copy suffix token so the dedup workload does
not degenerate into 10-member exact-duplicate groups).  ``duck`` runs
the same headline queries' DuckDB oracle SQL against identical parquet,
best-of-three per query — the apples-to-apples single-process anchor.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT_DIR = "/tmp/crossover/sf1"
SRC = "/root/testdata/sf0.1"
MULT = 10
KEYED = {
    # table -> (key columns to offset per copy, text column to tag)
    "lineitem": (["l_orderkey"], None),
    "orders": (["o_orderkey", "o_custkey"], None),
    "events": (["event_id", "user_id"], None),
    "documents": (["doc_id"], "text"),
    "embeddings": (["vec_id"], None),
}
COPY_AS_IS = ["region", "nation", "customer", "supplier", "part"]
OFF = 1_000_000_000

#: headline queries timed on the DuckDB side (same basket as bench.py,
#: minus pipeline_prep which has no standalone oracle — its work is
#: inside the anomaly_mse/minmax_scaled oracle CTEs, so the DuckDB side
#: pays the prep cost inside those timings; the Spark total for the
#: comparison therefore folds pipeline_prep+anomaly_mse together).
DUCK_QUERIES = [
    "anomaly_mse",
    "minmax_scaled",
    "threshold_split",
    "tpch_q1",
    "tpch_q3",
    "tpch_q5",
    "windowed_events",
    "dedup_exact",
    "dedup_minhash_lsh",
    "ann_cosine_topk",
    "text_quality_scores",
]


def gen() -> None:
    from pyspark.sql import functions as F

    from prometheus_anomaly_detection_lstm_spark.io_tables import load_table
    from prometheus_anomaly_detection_lstm_spark.session import get_spark

    spark = get_spark("sf1-gen")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(OUT_DIR, exist_ok=True)
    for name in COPY_AS_IS:
        load_table(spark, SRC, name).write.mode("overwrite").parquet(
            f"{OUT_DIR}/{name}.parquet"
        )
        print(f"{name}: copied", flush=True)
    for name, (keys, text_col) in KEYED.items():
        base = load_table(spark, SRC, name)
        copies = []
        for k in range(MULT):
            c = base
            for key in keys:
                c = c.withColumn(key, F.col(key) + F.lit(k * OFF))
            if text_col is not None and k > 0:
                c = c.withColumn(
                    text_col,
                    F.concat(F.col(text_col), F.lit(f" copyvariant{k}")),
                )
            copies.append(c)
        df = functools.reduce(lambda a, b: a.unionByName(b), copies)
        df.repartition(16).write.mode("overwrite").parquet(
            f"{OUT_DIR}/{name}.parquet"
        )
        print(f"{name}: x{MULT} written", flush=True)


def duck() -> None:
    import duckdb

    import __spark_entry__ as E

    oracles = E.oracle_sql()
    con = duckdb.connect()
    for t in COPY_AS_IS + list(KEYED):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{OUT_DIR}/{t}.parquet/*.parquet'"
        )
    timings: dict[str, float] = {}
    for name in DUCK_QUERIES:
        sql = oracles[name]
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
        print(f"{name}: {timings[name]}", flush=True)
    print(
        json.dumps(
            {
                "engine": "duckdb",
                "sf": 1.0,
                "value": round(sum(timings.values()), 3),
                "queries": timings,
            }
        )
    )


if __name__ == "__main__":
    {"gen": gen, "duck": duck}[sys.argv[1]]()
