"""Empty-corpus robustness for the continuation-4 queries: a fully
empty (but correctly-typed) testdata directory must yield an empty or
degenerate result — never an ANSI abort, NaN poison, or exception."""

from __future__ import annotations

import pytest

from prometheus_anomaly_detection_lstm_spark.registry import all_queries

NEW_QUERIES = [
    "join_key_skew_profile",
    "embedding_hard_negatives",
    "metric_sax_symbols",
    "text_pmi_collocations",
    "metric_spectral_residual",
    "metric_holt_winters",
    "embedding_centroid_drift",
    "metric_sax_motifs",
    "text_feature_hashing",
    "metric_pca_scores",
    "metric_seasonal_mad",
    "embedding_knn_label_audit",
    "metric_sax_similar_days",
    "dedup_lsh_bucket_profile",
    "dedup_hot_shingles",
    "orders_km_reorder_curve",
    "events_ab_cuped",
    "events_ab_power",
    "metric_df_stationarity",
]

_SCHEMAS = {
    "events": (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    ),
    "documents": "doc_id long, text string, lang string, source string, n_chars long",
    "embeddings": "vec_id long, embedding array<float>, label int",
    "lineitem": (
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp"
    ),
    "orders": (
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string, "
        "o_clerk string, o_shippriority int, o_comment string"
    ),
}


@pytest.fixture(scope="module")
def empty_sf(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("empty_sf8")
    for name, schema in _SCHEMAS.items():
        spark.createDataFrame([], schema).write.parquet(
            str(root / f"{name}.parquet")
        )
    return str(root)


@pytest.mark.parametrize("name", NEW_QUERIES)
def test_new_query_survives_empty_corpus(spark, empty_sf, name):
    fn, _ = all_queries()[name]
    rows = fn(spark, empty_sf).collect()
    # empty input -> empty result, or one degenerate summary row per
    # profiled relation; never an exception
    assert len(rows) <= 3
    for r in rows:
        for k, v in r.asDict().items():
            if k.startswith(("n_", "cnt")) and v is not None:
                assert v == 0, (name, k, v)
