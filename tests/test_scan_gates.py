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
    "events_heavy_hitters": 1,  # r13 fold: was 3 (MG + count + rescan)
    "semantic_dedup_scaled": 2,  # r13 narrow ckpt: was 4 (2 sides x chain)
}


#: round-13 (verdict task 3): the gates above count the TOP executed
#: plan only — a checkpoint truncates its subtree to `Scan ExistingRDD`,
#: so scans BELOW a checkpoint are invisible to them.  These ceilings
#: count the query's executed plan PLUS every checkpointed builder
#: frame's own executed plan (captured pre-truncation via
#: functions.checkpoint.capture_builders), i.e. the true number of
#: table scans one end-to-end execution performs.  Measured at sf0.001
#: on the r13 tree; ceilings exact (structural shapes).
#: NOTE on executed builders: a builder materialized at construction
#: (eager checkpoint, bounds collect) arrives with an AQE FINAL plan in
#: which runtime exchange reuse has already fired — its count is the
#: true lake-read count of that execution (e.g. mse_histogram's chain:
#: 5 initial-plan scans, 3 after AQE reuses two day_counts exchanges).
#: Unexecuted frames are counted from the initial plan (no runtime
#: reuse credit) — the same conservative basis as GATES above.
GATES_COMBINED = {
    "metric_esd_outliers": 1,
    "event_pagerank": 1,
    "event_graph_triangles": 1,
    "text_related_docs_topk": 1,
    "dedup_embedding_cosine": 1,
    "mse_histogram": 3,
    "dedup_ngram_jaccard": 1,
    "rolling_features": 5,
    "user_set_ops": 1,
    "anomaly_mse_lstm": 5,
    "corpus_dedup_e2e_stats": 5,
    "corpus_clean_tokenize_pack": 3,
    "events_anomaly_attribution": 2,
    "metric_sax_similar_days": 2,
    "metric_cointegration_pairs": 1,
    "metric_distribution_drift": 3,
    "text_containment_pairs": 1,
    "corpus_upsert_latest": 2,
    "dedup_minhash_incremental": 2,
    "text_nb_classifier": 4,
    "text_nb_classifier_auc": 4,
    "text_nb_confusion": 4,
    "text_pmi_collocations": 1,
    "metric_seasonal_mad": 3,
    "corpus_source_token_drift": 1,
    "metric_mad_outliers": 3,
    "metric_sax_motifs": 2,
    "multires_rollup": 1,
    "events_funnel_timing": 1,
    "promql_absent": 1,
    "events_heavy_hitters": 2,  # r13 fold: MG pass + exact rescan
    "semantic_dedup_scaled": 4,  # r13: assignment builder 2 + 2 re-attach
}


def _scan_counts(plan: str) -> collections.Counter:
    # an EXECUTED AdaptiveSparkPlan prints "== Final Plan ==" AND
    # "== Initial Plan ==" sections — counting both double-counts scans
    # (builders materialized at construction, e.g. by a bounds collect,
    # arrive executed).  The final plan is the execution's truth.
    plan = plan.split("== Initial Plan ==")[0]
    return collections.Counter(
        re.findall(r"Scan parquet[^\n]*?(\w+)\.parquet", plan)
    )


def _max_scans(spark, name: str) -> int:
    fn = all_queries()[name][0]
    plan = fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
    counts = _scan_counts(plan)
    return max(counts.values()) if counts else 0


def _max_combined_scans(spark, name: str) -> int:
    from prometheus_anomaly_detection_lstm_spark.functions.checkpoint import (
        capture_builders,
    )

    fn = all_queries()[name][0]
    with capture_builders() as builders:
        df = fn(spark, SF)
    counts: collections.Counter = collections.Counter()
    for frame in [df, *builders]:
        counts.update(
            _scan_counts(
                frame._jdf.queryExecution().executedPlan().toString()
            )
        )
    return max(counts.values()) if counts else 0


@pytest.mark.parametrize("name", sorted(GATES))
def test_scan_gate(spark, name):
    got = _max_scans(spark, name)
    assert got <= GATES[name], (
        f"{name}: {got} executed scans of one table (gate {GATES[name]}) — "
        "a round-12 checkpoint/fold regressed"
    )


@pytest.mark.parametrize("name", sorted(GATES_COMBINED))
def test_scan_gate_combined(spark, name):
    got = _max_combined_scans(spark, name)
    assert got <= GATES_COMBINED[name], (
        f"{name}: {got} scans of one table counting checkpointed "
        f"builder subtrees (gate {GATES_COMBINED[name]}) — a subtree "
        "below a checkpoint regressed"
    )


def test_combined_gate_sees_below_checkpoint(spark):
    """The blind-spot proof: doubling the scans INSIDE a checkpointed
    builder is invisible to the top-plan counter but caught by the
    combined counter."""
    from prometheus_anomaly_detection_lstm_spark.functions.checkpoint import (
        capture_builders,
        cut_lineage,
    )
    from prometheus_anomaly_detection_lstm_spark.io_tables import load_table

    ev = load_table(spark, SF, "events")
    doubled = ev.unionByName(ev)  # 2 scans of events
    with capture_builders() as builders:
        q = cut_lineage(doubled).groupBy().count()
    top = _scan_counts(
        q._jdf.queryExecution().executedPlan().toString()
    )
    assert top.get("events", 0) == 0  # checkpoint hides the subtree
    combined = collections.Counter(top)
    for frame in builders:
        combined.update(
            _scan_counts(
                frame._jdf.queryExecution().executedPlan().toString()
            )
        )
    assert combined["events"] == 2  # the combined counter sees them
