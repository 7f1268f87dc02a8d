"""Simulate the driver: fresh default session, entry() smoke, queries vs oracle."""
import hashlib
import sys

sys.path.insert(0, "/root/repo")

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

# Driver-style session: note deliberately NON-UTC timezone + default ANSI,
# to prove the contract doesn't depend on our own session factory.
spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.session.timeZone", "America/New_York")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as E

# 1. smoke: entry()
df = E.entry(spark)
rows = df.collect()
print(f"ENTRY: rows={len(rows)} schema={[f'{f.name}:{f.dataType.simpleString()}' for f in df.schema.fields]}")
print("ENTRY sample:", rows[:2])
anom = sum(1 for r in rows if r.is_anomaly == 1)
print(f"ENTRY anomalous={anom} normal={len(rows)-anom}")

# 2. queries vs oracle at sf0.01, driver-style hash compare
SF = "/root/testdata/sf0.01"
qs, oracles = E.queries(), E.oracle_sql()
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

def value_hash(pdf: pd.DataFrame) -> str:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pd.api.types.is_datetime64_any_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("datetime64[us]").astype("int64")
        elif pd.api.types.is_float_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("float64").round(6)
    pdf = pdf.sort_values(list(pdf.columns), ignore_index=True)
    return hashlib.md5(pdf.to_csv(index=False).encode()).hexdigest()

import sys as _s
names = _s.argv[1:] or ["anomaly_mse", "tpch_q1", "dedup_minhash_lsh", "ann_cosine_topk", "text_quality_scores"]
ok = 0
for name in names:
    sdf = qs[name](spark, SF).toPandas()
    if name not in oracles:  # driver's weaker rows-only check
        status = "ROWS_ONLY_OK" if len(sdf) >= 0 else "FAIL"
        ok += 1
        print(f"{name}: rows spark={len(sdf)} (no oracle) {status}")
        continue
    odf = con.execute(oracles[name]).df()
    hs, ho = value_hash(sdf), value_hash(odf)
    status = "MATCH" if hs == ho and len(sdf) == len(odf) else "MISMATCH"
    ok += status == "MATCH"
    print(f"{name}: rows spark={len(sdf)} duck={len(odf)} hash_{status}")
print(f"RESULT: {ok}/{len(names)} matched")
