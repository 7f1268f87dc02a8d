"""Round-12 verdict task 8: pin the bench summary-tail byte budget.

The driver's BENCH capture keeps only the LAST 2000 bytes of bench
output; BENCH_r11's summary was lost because the serialized tail
measured exactly 2000 bytes with the front truncated.  The r12 fix was
empirical curation; this test makes it a machine contract: the
serialized trailing summary — under WORST-CASE number widths, with
every optional key present — must stay within ``SUMMARY_BYTE_BUDGET``
(1900), leaving ≥100 bytes for the closing brace and wobble.  A new
summary key that pushes the copy over budget fails here before it can
cost an official artifact.
"""

from __future__ import annotations

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench

#: the graded queries rows (14 basket rows + the r13 prebuilt-LSH
#: addition) at worst-case serialized width.
WIDE = 9999.999
QUERY_ROWS = [
    "pipeline_prep", "anomaly_mse", "minmax_scaled", "threshold_split",
    "tpch_q1", "tpch_q3", "tpch_q5", "windowed_events", "dedup_exact",
    "dedup_minhash_lsh", "ann_cosine_topk", "ann_cosine_topk_lsh",
    "text_quality_scores", "tpch_q3_bucketed",
    "ann_cosine_topk_lsh_prebuilt",
]
DUCK_ROWS = [q for q in bench.COMPARABLE11]


def _core_out() -> dict:
    return {
        "value": WIDE * len(QUERY_ROWS),
        "queries": {q: WIDE for q in QUERY_ROWS},
        "queries_duck": {q: WIDE for q in DUCK_ROWS},
        "comparable11_total": WIDE,
        "comparable11_duck_total": WIDE,
        "comparable11_inrun_ratio": 999.999,
        "ann_lsh_recall_at_10": 0.8125,
        "ann_ivf_recall_at_10": 0.8125,
        "ann_pq_recall_at_10": 0.8125,
    }


def _serialized_tail_len(summary: dict) -> int:
    # the summary rides as the LAST key of the JSON line:
    # ... , "summary": {...}}\n
    return len(', "summary": ') + len(json.dumps(summary)) + 2


def test_summary_all_success_fits_budget():
    out = _core_out()
    for k in bench.SUMMARY_OPTIONAL_KEYS:
        if k.endswith("_error"):
            continue
        out[k] = 1 if k == "sf1_anomaly_waist_match" else WIDE
    n = _serialized_tail_len(bench.build_summary(out))
    assert n <= bench.SUMMARY_BYTE_BUDGET, (
        f"summary tail {n} B > {bench.SUMMARY_BYTE_BUDGET} B budget — "
        "a key was added without re-curating the compact copy"
    )


def test_summary_all_errors_fits_budget_and_truncates():
    out = _core_out()
    for k in bench.SUMMARY_OPTIONAL_KEYS:
        if k.endswith("_error"):
            out[k] = "SomeException: " + "x" * 500
    summary = bench.build_summary(out)
    for k, v in summary.items():
        if k.endswith("_error"):
            assert len(v) <= 60, f"{k} not truncated in summary copy"
    n = _serialized_tail_len(summary)
    assert n <= bench.SUMMARY_BYTE_BUDGET


def test_budget_leaves_capture_margin():
    # the driver capture is 2000 B; the budget must leave real margin
    assert bench.SUMMARY_BYTE_BUDGET <= 1900


def test_r12_artifact_tail_would_fit():
    # regression anchor: the shipped r12 artifact's summary (the best
    # live sample of realistic widths) must sit comfortably in budget
    p = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_r12.json")
    if not os.path.exists(p):
        pytest.skip("BENCH_r12.json not present")
    with open(p) as fh:
        parsed = json.load(fh).get("parsed", {})
    if "summary" not in parsed:
        pytest.skip("no summary in r12 artifact")
    assert _serialized_tail_len(parsed["summary"]) <= bench.SUMMARY_BYTE_BUDGET
