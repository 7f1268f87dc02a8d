"""Physical-plan regression guards for the scale claims (PLANS.md).

These assert the plan SHAPES that make the 100-TB story true — if a
refactor reintroduces a global sort into the flagship pipeline or an
n² nested-loop join into a pair operator, the suite fails before the
bench ever runs.
"""

from __future__ import annotations

import pytest

from prometheus_anomaly_detection_lstm_spark.registry import all_queries

from .conftest import SF_SMALL


def _plan(spark, name: str) -> str:
    fn, _ = all_queries()[name]
    return fn(spark, SF_SMALL)._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize(
    "name",
    ["anomaly_mse", "ffill_bfill", "rolling_features", "asof_join"],
)
def test_no_global_sort_in_bucketed_operators(spark, name):
    """Total-order semantics must come from bucket + carry/overlap, not
    a range-partitioned (global) sort of the big table."""
    assert "rangepartitioning" not in _plan(spark, name)


@pytest.mark.parametrize(
    "name",
    [
        "dedup_simhash_pairs",
        "dedup_ngram_jaccard",
        "dedup_minhash_lsh",
        "corpus_doc_packing",
    ],
)
def test_pair_operators_have_no_nested_loop_join(spark, name):
    """Candidate generation is hash equi-joins only: no
    BroadcastNestedLoopJoin / CartesianProduct anywhere in the plan."""
    plan = _plan(spark, name)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_embedding_cell_join_nested_loops_are_centroid_scale_only(spark):
    """dedup_embedding_cosine may nested-loop ONLY against the tiny
    centroid table (the IVF assignment idiom); the candidate-pair join
    itself must be an equi-join."""
    plan = _plan(spark, "dedup_embedding_cosine")
    assert "CartesianProduct" not in plan
    # every BNLJ in this plan is rows x n_cells — verify the pair join
    # between the two id sides is hash-based by checking equi-joins exist
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan


def test_tpch_scan_pushdown(spark):
    """Predicates and column pruning must reach the parquet scan."""
    plan = _plan(spark, "tpch_q6")
    assert "PushedFilters: [" in plan
    assert "PushedFilters: []" not in plan
    # projection pruning: only the 4 referenced lineitem columns are read
    read = plan.split("ReadSchema: ")[1].split("\n")[0]
    assert "l_comment" not in read and "l_partkey" not in read


def test_flagship_has_no_python_row_udfs(spark):
    """The stub-model scoring path is pure Catalyst: no BatchEvalPython
    (row-at-a-time Python UDF) stages anywhere."""
    assert "BatchEvalPython" not in _plan(spark, "anomaly_mse")


def test_tfidf_idf_join_is_size_gated(spark):
    """The idf join strategy follows the broadcast_idf gate: forced
    broadcast -> BroadcastHashJoin on term; forced shuffle (the
    huge-vocab path) -> SortMergeJoin; the default leaves the choice to
    Catalyst/AQE's size estimate."""
    from prometheus_anomaly_detection_lstm_spark.operators.text import (
        _docs,
        tfidf_top_terms,
    )

    docs = _docs(spark, SF_SMALL)

    def plan(**kw):
        return (
            tfidf_top_terms(docs, **kw)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )

    assert "BroadcastHashJoin" in plan(broadcast_idf=True)
    shuffled = plan(broadcast_idf=False)
    assert "SortMergeJoin" in shuffled


@pytest.mark.parametrize(
    "name",
    ["corpus_shuffle_shards", "corpus_token_budget_sample", "text_repetition_scores"],
)
def test_new_corpus_ops_have_no_global_sort(spark, name):
    """Deterministic order comes from per-shard/per-source windows, not
    a range-partitioned global sort."""
    assert "rangepartitioning" not in _plan(spark, name).lower()


def test_decontaminate_is_equi_join_only(spark):
    """The benchmark-gram join must stay a hash equi-join (inverted
    index), never a nested loop over |train| x |bench|."""
    plan = _plan(spark, "corpus_decontaminate")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_range_join_is_bucketized_hash_join(spark):
    """The point-in-interval join must be day-bucketized: hash equi-join
    on the day, never a BETWEEN nested loop over points x intervals."""
    plan = _plan(spark, "range_join_interval_counts")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_prep_chain_has_one_full_data_exchange_per_subtree(spark):
    """The align->fill->scale chain rides ONE day-hash repartition: the
    pivot agg, fill windows and summary all reuse it, so the only
    full-data exchanges in the plan are the REPARTITION_BY_COL roots
    (one per logical subtree — main + the tiny summary branch share the
    same canonical shuffle at runtime), plus metadata-scale
    single-partition exchanges for the cross-day carry."""
    from prometheus_anomaly_detection_lstm_spark.plans import pipeline as P

    plan = (
        P.preprocessed(spark, SF_SMALL, keep_day=True)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    import re

    exchanges = re.findall(r"Exchange (\w+)\(([^)]*)\), (\w+)", plan)
    # full-data exchanges must all be the deliberate day repartition;
    # an ENSURE_REQUIREMENTS exchange keyed on data columns (__day, ts)
    # would mean an operator stopped reusing the day distribution.  The
    # carry window's exchange hashes a projected CONSTANT
    # (single_partition_key -> `_w<n>`) over the ~#days summary — the
    # one allowed ENSURE_REQUIREMENTS hash.
    bad = [
        (key, reason)
        for kind, key, reason in exchanges
        if kind == "hashpartitioning"
        and reason == "ENSURE_REQUIREMENTS"
        and not key.startswith("_w")
    ]
    assert not bad, exchanges
    repartitions = [
        key for kind, key, reason in exchanges
        if reason == "REPARTITION_BY_COL"
    ]
    assert repartitions and all("__day" in k for k in repartitions)
    assert "rangepartitioning" not in plan.lower()


@pytest.mark.parametrize(
    "name", ["tpch_q10", "tpch_q14", "tpch_q16", "tpch_q18", "tpch_q19"]
)
def test_tpch_wave2_filters_reach_scans(spark, name):
    """Every second-wave TPC-H query pushes at least one predicate into
    a parquet scan and plans hash joins only (no nested loops over
    facts; q22's one-row scalar broadcast is exempt by omission here)."""
    plan = _plan(spark, name)
    assert "PushedFilters: [" in plan
    assert any(
        "PushedFilters: [" + tok in plan
        for tok in ("IsNotNull", "EqualTo", "GreaterThan", "LessThan", "In(")
    ), plan.split("PushedFilters")[1][:200]
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_tpch_q18_reuses_orderkey_exchange(spark):
    """Q18's HAVING rollup and the orders join share l_orderkey: the
    aggregated side must NOT be re-exchanged between the agg and the
    join (one shuffle on the fact, then join)."""
    plan = _plan(spark, "tpch_q18")
    # the lineitem side appears once: count hashpartitioning exchanges
    # on l_orderkey — the rollup's exchange must serve the join too.
    n_orderkey_exchanges = plan.count("hashpartitioning(l_orderkey")
    assert n_orderkey_exchanges <= 1, plan


def test_q19_brand_filter_pushed_to_part_scan(spark):
    """The factored-out brand membership must reach the part scan as an
    In() filter rather than evaluating post-join."""
    plan = _plan(spark, "tpch_q19")
    assert "In(p_brand" in plan, plan


def test_dup_ngram_spans_single_shuffle(spark):
    """Span mining is explode -> ONE keyed agg: exactly one exchange,
    keyed on the span, no join anywhere."""
    plan = _plan(spark, "text_dup_ngram_spans")
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") <= 2  # partial+final agg pair


@pytest.mark.parametrize(
    "name",
    [
        "tpch_q8", "tpch_q9", "tpch_q11", "tpch_q12", "tpch_q13",
        "tpch_q15", "tpch_q17", "tpch_q20", "tpch_q21",
    ],
)
def test_tpch_wave3_no_nested_loops_and_pushdown(spark, name):
    """Third-wave TPC-H: hash joins only over facts, and at least one
    predicate pushed into a parquet scan."""
    plan = _plan(spark, name)
    assert "CartesianProduct" not in plan
    assert "PushedFilters: [" in plan
    assert any(
        "PushedFilters: [" + tok in plan
        for tok in ("IsNotNull", "EqualTo", "GreaterThan", "LessThan", "In(")
    )


def test_tpch_q17_aggregates_only_brand_lines(spark):
    """The per-part average must aggregate the brand-restricted
    lineitem subset (semi-join pushed below the agg), not the whole
    fact table: the brand filter appears on the part scan and every
    exchange is keyed on l_partkey."""
    plan = _plan(spark, "tpch_q17")
    assert "EqualTo(p_brand,Brand#16)" in plan, plan.split("PushedFilters")[-1][:150]
    for seg in plan.split("Exchange hashpartitioning(")[1:]:
        key = seg.split(",")[0]
        assert key.startswith("l_partkey") or key.startswith("__pk"), key


def test_promql_single_exchange(spark):
    """rate()/over_time(): the per-series lag window and the bucket
    aggregate share one hash distribution on metric — exactly one
    exchange, and never a global (range-partitioned) sort."""
    for name in ("promql_counter_rate", "promql_gauge_over_time"):
        plan = _plan(spark, name)
        assert plan.count("Exchange hashpartitioning") == 1, name
        assert "rangepartitioning" not in plan.lower(), name


def test_promql_histogram_quantile_shuffles_only_counts(spark):
    """Both exchanges sit ABOVE the partial bucket-count aggregate:
    what shuffles is (metric, window, le-slot) count rows, never raw
    samples; the crossing-slot window and final min_by reuse the
    second distribution."""
    plan = _plan(spark, "promql_histogram_quantile")
    assert plan.count("Exchange hashpartitioning") == 2, plan
    assert "rangepartitioning" not in plan.lower()
    # partial aggregation happens below the first exchange
    first_exchange_pos = plan.index("Exchange hashpartitioning")
    assert "HashAggregate" in plan[first_exchange_pos:], plan
