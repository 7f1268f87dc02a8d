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

#: standalone headline queries timed on the DuckDB side from their
#: registry oracles verbatim.  The four pipeline-derived entries are
#: timed separately (see ``duck``) through a shared materialized prep
#: table — the EXACT shape bench.py times on the Spark side (prep
#: persists once; mse/minmax/split consume the cache), so every basket
#: line is now apples-to-apples including pipeline_prep (round-4
#: verdict task 5: prep and mse were previously conflated).
DUCK_QUERIES = [
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


def duck(src: str = OUT_DIR, sf: float = 1.0) -> None:
    import duckdb

    import __spark_entry__ as E
    from prometheus_anomaly_detection_lstm_spark import oracles as O

    oracles = E.oracle_sql()
    con = duckdb.connect()
    for t in COPY_AS_IS + list(KEYED):
        glob = "/*.parquet" if os.path.isdir(f"{src}/{t}.parquet") else ""
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{src}/{t}.parquet{glob}'"
        )
    timings: dict[str, float] = {}

    def best_of(name: str, run) -> None:
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            run()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
        print(f"{name}: {timings[name]}", flush=True)

    # ---- shared pipeline, bench.py's exact shape: materialize the
    # aligned->filled->scaled frame ONCE, then the three consumers
    # read the materialization (Spark persists; DuckDB temp-tables)
    prep_sql = O.pipeline_prefix("scaled") + "\nSELECT * FROM scaled"
    mse_from_prep = (
        "WITH "
        + O.ERR_CTE.replace("FROM scaled", "FROM __prep")
        + ",\n"
        + O.WIN_CTE
        + f"\nSELECT window_id, ts AS start_ts, round(mse, 8) AS mse"
        f" FROM win WHERE cnt = {O.L}"
    )
    minmax_from_prep = (
        "SELECT ts, "
        + ", ".join(f"round({c}, 6) AS {c}" for c in O.FEATURES)
        + " FROM __prep"
    )
    split_from_prep = (
        "WITH "
        + O.ERR_CTE.replace("FROM scaled", "FROM __prep")
        + ",\n"
        + O.WIN_CTE
        + f""",
flags AS (
  SELECT CAST(mse > {O.ANOMALY_THRESHOLD} AS BIGINT) AS is_anomaly
  FROM win WHERE cnt = {O.L}
)
SELECT is_anomaly, CAST(count(*) AS BIGINT) AS n,
       round(count(*) * 100.0 / sum(count(*)) OVER (), 6) AS pct
FROM flags GROUP BY 1"""
    )

    def make_prep():
        con.execute("DROP TABLE IF EXISTS __prep")
        con.execute(f"CREATE TEMP TABLE __prep AS {prep_sql}")

    best_of("pipeline_prep", make_prep)
    best_of("anomaly_mse", lambda: con.execute(mse_from_prep).fetchall())
    best_of(
        "minmax_scaled", lambda: con.execute(minmax_from_prep).fetchall()
    )
    best_of(
        "threshold_split", lambda: con.execute(split_from_prep).fetchall()
    )

    for name in DUCK_QUERIES:
        sql = oracles[name]
        best_of(name, lambda sql=sql: con.execute(sql).fetchall())
    print(
        json.dumps(
            {
                "engine": "duckdb",
                "sf": sf,
                "value": round(sum(timings.values()), 3),
                "queries": timings,
            }
        )
    )


if __name__ == "__main__":
    cmd = sys.argv[1]
    if cmd == "gen":
        gen()
    elif cmd == "duck":
        duck()
    elif cmd == "duck0.1":
        # same basket against the sf0.1 source tables (single-file
        # parquet) — the anchor row for the growth comparison
        duck(src=SRC, sf=0.1)
    else:
        raise SystemExit(f"unknown command {cmd}")
