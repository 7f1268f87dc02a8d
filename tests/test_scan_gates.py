"""Scan-count regression gates for the round-12 repeated-scan sweep.

Each fixed query's executed plan must keep its reduced table-scan
count (the audit counts `Scan parquet` nodes per table in the
executed-plan string — the same method as tools/scan_audit.py).  A
regression here means a checkpoint was dropped or a new consumer was
chained above it, silently re-introducing N full lake reads at scale.
Ceilings are one above the measured post-fix count where planner noise
is plausible, exact where the fix pins a structural shape.
"""

from __future__ import annotations

import collections
import re

import pytest

from prometheus_anomaly_detection_lstm_spark.registry import all_queries

SF = "/root/testdata/sf0.001"  # shape-only: smallest data, same plans

#: query -> max allowed scans of its dominant table (post-fix measured
#: count at the top of the range; pre-fix counts in parentheses).
GATES = {
    "metric_esd_outliers": 2,  # was 62
    "event_pagerank": 2,  # was 19
    "event_graph_triangles": 2,  # was 15
    "text_related_docs_topk": 6,  # was 12
    "dedup_embedding_cosine": 2,  # was 10
    "mse_histogram": 6,  # was 10
    "dedup_ngram_jaccard": 2,  # was 8
    "rolling_features": 5,  # was 8 (bucket_assign subtrees fixed; ffill summary keeps 3)
    "user_set_ops": 1,  # was 4
    "anomaly_mse_lstm": 5,  # was 8
    "corpus_dedup_e2e_stats": 6,  # was 9
    "corpus_clean_tokenize_pack": 5,  # was 7
    "events_anomaly_attribution": 5,  # was 8
    "metric_sax_similar_days": 3,  # was 6
    "metric_cointegration_pairs": 2,  # was 6
    "metric_distribution_drift": 1,  # was 6
    "text_containment_pairs": 1,  # was 6
    "corpus_upsert_latest": 1,  # was 5
    "dedup_minhash_incremental": 1,  # was 6 (2 checkpoint materializations)
    "text_nb_classifier": 3,  # was 6
    "text_nb_classifier_auc": 3,  # was 6
    "text_nb_confusion": 3,  # was 5
    "text_pmi_collocations": 1,  # was 4
    "metric_seasonal_mad": 1,  # was 4
    "corpus_source_token_drift": 1,  # was 4
    "metric_mad_outliers": 1,  # was 4
    "metric_sax_motifs": 1,  # was 4
    "multires_rollup": 1,  # was 3
    "events_funnel_timing": 1,  # was 3
    "promql_absent": 1,  # was 3
}


def _max_scans(spark, name: str) -> int:
    fn = all_queries()[name][0]
    plan = fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
    tables = re.findall(r"Scan parquet[^\n]*?(\w+)\.parquet", plan)
    counts = collections.Counter(tables)
    return max(counts.values()) if counts else 0


@pytest.mark.parametrize("name", sorted(GATES))
def test_scan_gate(spark, name):
    got = _max_scans(spark, name)
    assert got <= GATES[name], (
        f"{name}: {got} executed scans of one table (gate {GATES[name]}) — "
        "a round-12 checkpoint/fold regressed"
    )
