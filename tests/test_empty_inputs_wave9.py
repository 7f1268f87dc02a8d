"""Empty-corpus robustness for the round-6 queries: a fully empty
(but correctly-typed) testdata directory must yield an empty or
degenerate result — never an ANSI abort, NaN poison, or exception."""

from __future__ import annotations

import pytest

from prometheus_anomaly_detection_lstm_spark.registry import all_queries

NEW_QUERIES = [
    "metric_ramp_detect",
    "events_ab_sequential",
    "orders_basket_affinity",
    "metric_glr_changepoint",
    "corpus_dedup_e2e_stats",
    "text_keyword_extract",
    "semantic_dedup_scaled",
    "promql_holt_smoothing",
    "metric_esd_outliers",
    "metric_ar2_residuals",
    "events_anomaly_attribution",
    "orders_price_elasticity",
    "metric_cointegration_pairs",
    "embedding_kcenter_coreset",
    "text_burstiness",
    "events_ab_srm_check",
    "metric_glr_variance_change",
    "corpus_sample_ngram_coverage",
    "text_source_overlap_matrix",
]

_SCHEMAS = {
    "events": (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    ),
    "documents": (
        "doc_id long, text string, lang string, source string, "
        "n_chars long"
    ),
    "embeddings": "vec_id long, embedding array<float>, label int",
    "lineitem": (
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp"
    ),
    "part": (
        "p_partkey long, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double"
    ),
    "orders": (
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string"
    ),
    "customer": (
        "c_custkey long, c_name string, c_nationkey long, "
        "c_mktsegment string, c_acctbal double"
    ),
}


@pytest.fixture(scope="module")
def empty_sf(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("empty_sf9")
    for name, schema in _SCHEMAS.items():
        spark.createDataFrame([], schema).write.parquet(
            str(root / f"{name}.parquet")
        )
    return str(root)


@pytest.mark.parametrize("name", NEW_QUERIES)
def test_round6_query_survives_empty_corpus(spark, empty_sf, name):
    fn, _ = all_queries()[name]
    rows = fn(spark, empty_sf).collect()
    # empty input -> empty result, or the fixed funnel-stage rows with
    # zero counts; never an exception
    assert len(rows) <= 5
    for r in rows:
        for k, v in r.asDict().items():
            if k.startswith(("n_", "cnt")) and v is not None:
                assert v == 0, (name, k, v)
