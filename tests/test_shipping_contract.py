"""Driver-contract order independence (round-12 preflight finding).

A UDF-bearing registry query run as the FIRST query of a session whose
driver cwd is OUTSIDE the repo must work: closures sent through
applyInPandas pickle package symbols by module reference, so the
worker can only import them after shipping.ensure_shipped — which the
registry wrapper now guarantees for every query.  Before the fix,
metric_holt_winters (and any UDF query) raised ModuleNotFoundError on
the executor whenever no earlier query in the window had shipped the
package zip; eleven rounds of green windows never exposed it because
some earlier query always had.
"""

from __future__ import annotations

import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

SCRIPT = """
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
spark = (
    SparkSession.builder.master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .appName("ship-contract").getOrCreate()
)
from prometheus_anomaly_detection_lstm_spark.registry import all_queries
df = all_queries()["metric_holt_winters"][0](spark, "/root/testdata/sf0.001")
rows = df.collect()
print("SHIP_OK", len(rows))
"""


def test_udf_query_first_from_foreign_cwd(tmp_path):
    proc = subprocess.run(
        [sys.executable, "-c", SCRIPT.format(repo=str(REPO))],
        cwd=str(tmp_path),  # NOT the repo — imports must ship via zip
        capture_output=True,
        text=True,
        timeout=300,
        env={**os.environ, "PYTHONPATH": ""},
    )
    assert "SHIP_OK" in proc.stdout, (
        f"stdout={proc.stdout[-2000:]}\nstderr={proc.stderr[-2000:]}"
    )


def test_registry_wrapper_preserves_wrapped():
    from prometheus_anomaly_detection_lstm_spark import registry

    q = registry.all_queries()["tpch_q1"][0]
    assert hasattr(q, "__wrapped__")
