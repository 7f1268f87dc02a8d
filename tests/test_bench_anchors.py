"""bench.py in-run anchor helpers: the official artifact's ratios
depend on _duck_connect registering every table (plain files AND
Spark-written directory parquet via glob) and _duck_pass timing each
oracle — a silent view miss would surface as a bench *_error key and
lose the round's anchor record."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench

from .conftest import SF_ORACLE


def test_duck_connect_registers_flat_files():
    con = bench._duck_connect(SF_ORACLE)
    n = con.execute("SELECT count(*) FROM documents").fetchone()[0]
    assert n > 0
    # every comparable-11 table the anchors touch must resolve
    for t in ("lineitem", "orders", "customer", "events", "embeddings"):
        assert con.execute(f"SELECT count(*) FROM {t}").fetchone()[0] > 0


def test_duck_connect_globs_directory_parquet(tmp_path, spark):
    from prometheus_anomaly_detection_lstm_spark.io_tables import load_table

    docs = load_table(spark, SF_ORACLE, "documents").limit(7)
    out = tmp_path / "documents.parquet"
    docs.write.mode("overwrite").parquet(str(out))
    con = bench._duck_connect(str(tmp_path))
    assert con.execute("SELECT count(*) FROM documents").fetchone()[0] == 7


def test_duck_pass_times_each_oracle():
    con = bench._duck_connect(SF_ORACLE)
    out = bench._duck_pass(
        con,
        {
            "n_docs": "SELECT count(*) AS n FROM documents",
            "n_orders": "SELECT count(*) AS n FROM orders",
        },
    )
    assert set(out) == {"n_docs", "n_orders"}
    assert all(isinstance(v, float) and v >= 0 for v in out.values())
