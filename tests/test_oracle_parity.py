"""Every registry query must match its DuckDB oracle (driver's t2 gate,
replicated locally at small scale)."""

from __future__ import annotations

import pytest

from prometheus_anomaly_detection_lstm_spark.registry import all_queries

from .conftest import SF_ORACLE
from .oracle_harness import compare

CASES = sorted(all_queries().items())


@pytest.mark.parametrize(
    "name,case", CASES, ids=[name for name, _ in CASES]
)
def test_oracle_parity(spark, name, case):
    fn, sql = case
    df = fn(spark, SF_ORACLE)
    if sql is None:
        assert df.count() >= 0  # rows-only check, mirrors driver behavior
        return
    errs = compare(df, sql, SF_ORACLE)
    assert not errs, f"{name}: " + "; ".join(errs)
