"""Query registry: every implemented operator as (Spark callable, oracle SQL).

The driver contract (``__spark_entry__.py``) runs each callable at
sf=0.01 and hash-compares it against the oracle SQL run by DuckDB on the
same parquet tables.  Column names and float rounding are aligned on
both sides (see oracles.py).

Each entry exercises one or more SURVEY §2 operators; the mapping is
noted per query.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import oracles
from .operators import align, fill, scale, score
from .plans import pipeline as P
from .functions.checkpoint import cut_lineage

QueryFn = Callable[[SparkSession, str], DataFrame]


def _utc(spark: SparkSession) -> None:
    """Pin session TZ — reference timestamps are tz-naive UTC (SURVEY H3)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")


# --------------------------------------------------------------- domain

def q_metrics_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 outer align + U3 keep-first dedup fused into one pivot shuffle."""
    _utc(spark)
    return P.wide_frame(spark, sf_dir)


def q_calendar_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4: weekday Mon=0 + hour-of-day (pandas convention, SURVEY H3)."""
    _utc(spark)
    return P.with_calendar(P.wide_frame(spark, sf_dir)).select(
        "ts", "day_of_week", "hour_of_day"
    )


def q_ffill_bfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1: day-partitioned scalable ffill->bfill (exact-copy values)."""
    _utc(spark)
    df = P.with_calendar(P.wide_frame(spark, sf_dir))
    return fill.ffill_bfill_scalable(df, P.METRICS).select("ts", *P.METRICS)


def q_fill_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: mean-fill strategy."""
    _utc(spark)
    df = fill.fill_mean(P.wide_frame(spark, sf_dir), P.METRICS)
    return df.select("ts", *[F.round(m, 6).alias(m) for m in P.METRICS])


def q_fill_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: exact-median fill strategy."""
    _utc(spark)
    df = fill.fill_median(P.wide_frame(spark, sf_dir), P.METRICS)
    return df.select("ts", *[F.round(m, 6).alias(m) for m in P.METRICS])


def q_scaler_params(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4+A5/S9: the scaler artifact as a params table (sklearn-exact)."""
    _utc(spark)
    df = P.with_calendar(P.wide_frame(spark, sf_dir))
    df = fill.ffill_bfill_scalable(df, P.METRICS)
    params = scale.fit_params(df, P.FEATURES)
    return params.select(
        "feature",
        F.round("min", 6).alias("min"),
        F.round("max", 6).alias("max"),
        F.round("mean", 6).alias("mean"),
        F.round("std_pop", 6).alias("std_pop"),
    )


def q_minmax_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1/A4: MinMax transform, calendar features scaled too (SURVEY §3.2)."""
    _utc(spark)
    df = P.preprocessed(spark, sf_dir)
    return df.select("ts", *[F.round(c, 6).alias(c) for c in P.FEATURES])


def q_standard_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1/A5: StandardScaler transform with POPULATION std (SURVEY H2)."""
    _utc(spark)
    df = P.with_calendar(P.wide_frame(spark, sf_dir))
    df = fill.ffill_bfill_scalable(df, P.METRICS)
    df = scale.standard_transform(df, P.FEATURES)
    return df.select("ts", *[F.round(c, 6).alias(c) for c in P.FEATURES])


def q_anomaly_mse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FLAGSHIP — A6/W2: per-window stub-model reconstruction MSE."""
    _utc(spark)
    return P.anomaly_scores(spark, sf_dir)


def q_anomaly_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7: threshold predicate on window MSE."""
    _utc(spark)
    return P.anomaly_flags(spark, sf_dir)


def q_anomaly_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: consecutive anomalous windows merged into
    alert episodes (first/last window, count, start, peak MSE)."""
    _utc(spark)
    return P.anomaly_intervals(spark, sf_dir)


def q_threshold_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8/A9: normal-vs-anomalous counts and percentages.

    Same day_counts injection as the flagship (plans/pipeline.py):
    the bucketing summary reads one shallow raw-events agg instead of
    re-executing pivot->fill->scale per subtree.
    """
    _utc(spark)
    df = P.preprocessed(spark, sf_dir, keep_day=True)
    mse = score.window_mse(
        df, P.FEATURES, P.SEQUENCE_LENGTH, day_col="__day",
        day_counts=P.pivot_day_counts(spark, sf_dir),
    )
    out = score.threshold_split(mse, P.ANOMALY_THRESHOLD)
    return out.select("is_anomaly", "n", F.round("pct", 6).alias("pct"))


def q_mse_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7: 50-bin error histogram (bucketed on rounded MSE for parity).

    The histogram's bounds agg and bucketing stage are TWO consumers
    of the window-MSE frame — Catalyst re-executed the whole flagship
    chain for each (round-12 audit).  The frame is time-grid-scale
    (one row per minute, bounded by the horizon, not data volume), so
    it is lazily checkpointed: one chain execution, full-cost A/B
    2.84 -> 2.55 s at sf0.1, hash-identical.  Executor-loss caveat:
    see events_association_rules (relational.py)."""
    _utc(spark)
    mse = P.anomaly_scores(spark, sf_dir).transform(cut_lineage)
    return score.mse_histogram(mse.select("mse"), bins=50)


def q_threshold_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11: exact p95/p99 threshold suggestion."""
    _utc(spark)
    mse = P.anomaly_scores(spark, sf_dir)
    out = score.threshold_percentiles(mse)
    return out.select(
        F.round("p95", 8).alias("p95"), F.round("p99", 8).alias("p99")
    )


def q_per_feature_mse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8: per-feature reconstruction MSE (labeled-gauge shape)."""
    _utc(spark)
    df = P.preprocessed(spark, sf_dir)
    out = score.per_feature_mse(df, P.FEATURES)
    return out.select("feature", F.round("mse", 8).alias("mse"))


def q_tail_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U5: last-L-rows by recency (TakeOrderedAndProject, no full sort)."""
    _utc(spark)
    return align.tail_n(P.wide_frame(spark, sf_dir), P.SEQUENCE_LENGTH)


def q_inner_align(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: intersection-only alignment (realtime semantics)."""
    _utc(spark)
    return align.inner_align(P.wide_frame(spark, sf_dir), P.METRICS)


def q_dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3: keep-first dedup with provenance ordering."""
    _utc(spark)
    long = P.events_long(spark, sf_dir).withColumn(
        "ts", F.date_trunc("minute", F.col("ts"))
    )
    return align.dedup_keep_first(long, ["ts", "metric"], ["seq"])


def q_multi_series_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4: first-series collapse (keep lowest series id per group)."""
    _utc(spark)
    df = P.load(spark, sf_dir, "events").select(
        F.date_trunc("minute", "ts").alias("ts"),
        F.col("event_type").alias("metric"),
        "user_id",
        "value",
    )
    return align.first_series(df, ["ts", "metric"], "user_id")


def q_union_periods(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1/U2+U3: period union then keep-first dedup by (period, seq)."""
    _utc(spark)
    long = P.events_long(spark, sf_dir).withColumn(
        "ts", F.date_trunc("minute", F.col("ts"))
    )
    split = F.lit("2024-01-15 00:00:00").cast("timestamp")
    p0 = long.filter(F.col("ts") < split).withColumn("period_idx", F.lit(0))
    p1 = long.filter(F.col("ts") >= split).withColumn("period_idx", F.lit(1))
    both = align.union_periods([p0, p1])
    out = align.dedup_keep_first(both, ["ts", "metric"], ["period_idx", "seq"])
    return out.select("ts", "metric", "value")


def q_backfill_missing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6: absent metrics materialized as all-NULL double columns."""
    _utc(spark)
    wide = P.wide_frame(spark, sf_dir)
    return align.backfill_missing_columns(
        wide, P.METRICS + ["latency", "cpu"]
    )


def q_numeric_coercion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2: to-numeric with NULL on unparseable input (try_cast)."""
    _utc(spark)
    ev = P.load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.expr(
            "try_cast(regexp_extract(props, '\"k\": ([0-9]+)', 1) AS DOUBLE)"
        ).alias("k_num"),
        F.expr("try_cast(event_type AS DOUBLE)").alias("bad"),
    )


def q_mse_via_mapinpandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M5: the Arrow-batched mapInPandas inference path (broadcast-weight
    scoring over materialized windows) — same oracle as the Catalyst
    scoring path, proving the two physical strategies agree."""
    _utc(spark)
    from .ml.autoencoder import StubAutoencoder
    from .ml.infer import score_windows
    from .operators.windows import sequence_windows_scalable

    df = P.preprocessed(spark, sf_dir)
    windows = sequence_windows_scalable(df, P.FEATURES, P.SEQUENCE_LENGTH)
    scored = score_windows(windows, StubAutoencoder)
    return scored.select(
        "window_id", "start_ts", F.round("mse", 8).alias("mse")
    )


DOMAIN_QUERIES: dict[str, tuple[QueryFn, str | None]] = {
    "metrics_wide": (q_metrics_wide, oracles.ORACLE_WIDE),
    "calendar_features": (q_calendar_features, oracles.ORACLE_CALENDAR),
    "ffill_bfill": (q_ffill_bfill, oracles.ORACLE_FFILL_BFILL),
    "fill_mean": (q_fill_mean, oracles.ORACLE_FILL_MEAN),
    "fill_median": (q_fill_median, oracles.ORACLE_FILL_MEDIAN),
    "scaler_params": (q_scaler_params, oracles.ORACLE_SCALER_PARAMS),
    "minmax_scaled": (q_minmax_scaled, oracles.ORACLE_MINMAX_SCALED),
    "standard_scaled": (q_standard_scaled, oracles.ORACLE_STANDARD_SCALED),
    "anomaly_mse": (q_anomaly_mse, oracles.ORACLE_ANOMALY_MSE),
    "anomaly_flags": (q_anomaly_flags, oracles.ORACLE_ANOMALY_FLAGS),
    "anomaly_intervals": (q_anomaly_intervals, oracles.ORACLE_ANOMALY_INTERVALS),
    "threshold_split": (q_threshold_split, oracles.ORACLE_THRESHOLD_SPLIT),
    "mse_histogram": (q_mse_histogram, oracles.ORACLE_MSE_HISTOGRAM),
    "threshold_percentiles": (
        q_threshold_percentiles,
        oracles.ORACLE_THRESHOLD_PERCENTILES,
    ),
    "per_feature_mse": (q_per_feature_mse, oracles.ORACLE_PER_FEATURE_MSE),
    "tail_n": (q_tail_n, oracles.ORACLE_TAIL_N),
    "inner_align": (q_inner_align, oracles.ORACLE_INNER_ALIGN),
    "dedup_keep_first": (q_dedup_keep_first, oracles.ORACLE_DEDUP_KEEP_FIRST),
    "multi_series_first": (
        q_multi_series_first,
        oracles.ORACLE_MULTI_SERIES_FIRST,
    ),
    "union_periods": (q_union_periods, oracles.ORACLE_UNION_PERIODS),
    "backfill_missing": (q_backfill_missing, oracles.ORACLE_BACKFILL_MISSING),
    "numeric_coercion": (q_numeric_coercion, oracles.ORACLE_NUMERIC_COERCION),
}


#: Physical-path twins with the same oracle as a registry entry: graded
#: by the local parity suite (tests/test_oracle_parity.py) but kept out
#: of the driver registry so the driver's grading window is spent on
#: distinct operators, not duplicate physical strategies.
def _bpe_bounded_entry() -> tuple[QueryFn, str | None]:
    from .operators.bpe import (
        FROZEN_MERGES,
        _bpe_encode_oracle,
        q_corpus_bpe_encode_bounded,
    )

    return (q_corpus_bpe_encode_bounded, _bpe_encode_oracle(FROZEN_MERGES))


def _ensure_ann_index(
    sf_dir: str,
    subdir: str,
    probe: str,
    rows: int,
    build_recipe: dict,
    build,
) -> str:
    """Build-or-reuse a persisted ANN index under /tmp.

    Recipe stamp (r8 ADVICE precedent, widened by the r10 ADVICE): a
    cached index is reused only if it was built from the
    same-cardinality input AND the same build config/code version —
    otherwise a stale /tmp index would silently grade other data or an
    outdated trainer's output.  ``probe`` is the payload subdirectory
    whose presence marks a completed build."""
    import json
    import os
    import tempfile

    tag = "".join(c if c.isalnum() else "_" for c in sf_dir.rstrip("/"))
    path = os.path.join(tempfile.gettempdir(), subdir, tag)
    recipe = {"sf_dir": sf_dir.rstrip("/"), "rows": rows, **build_recipe}
    stamp = os.path.join(path, "recipe.json")
    reusable = False
    if os.path.isdir(os.path.join(path, probe)) and os.path.exists(stamp):
        try:
            with open(stamp) as fh:
                reusable = json.load(fh) == recipe
        except (json.JSONDecodeError, OSError):
            reusable = False
    if not reusable:
        build(path)
        with open(stamp, "w") as fh:
            json.dump(recipe, fh)
    return path


def _pq_prebuilt_entry() -> tuple[QueryFn, str | None]:
    """ann_cosine_topk_pq through the persisted-index deployment path
    (build_pq_index under /tmp keyed by sf_dir, then pq_topk_prebuilt)
    — same exact oracle as the inline query, graded by the parity
    suite without spending a driver window slot on a duplicate
    physical strategy (the prebuilt==inline pin also lives in
    tests/test_similarity_recall.py)."""
    from .operators.kmeans import (
        _pq_topk_oracle,
        _vec,
        build_pq_index,
        pq_build_recipe,
        pq_topk_prebuilt,
    )

    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        vec = _vec(spark, sf_dir)
        path = _ensure_ann_index(
            sf_dir,
            "prometheus_anomaly_detection_lstm_spark_pq",
            "codes",
            vec.count(),
            pq_build_recipe(),
            lambda p: build_pq_index(vec, p),
        )
        return pq_topk_prebuilt(spark, path)

    return (q, _pq_topk_oracle())


def _lsh_prebuilt_entry() -> tuple[QueryFn, str | None]:
    """ann_cosine_topk_lsh through the persisted-index path
    (build_lsh_index + cosine_topk_lsh_prebuilt at the LSH_RECALL08
    production config) — same exact oracle as the inline query
    (round-10 verdict task 4, mirroring the PQ precedent)."""
    from .operators.similarity import (
        LSH_RECALL08,
        _emb,
        _lsh_oracle,
        build_lsh_index,
        cosine_topk_lsh_prebuilt,
        lsh_build_recipe,
    )

    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        emb = _emb(spark, sf_dir)
        path = _ensure_ann_index(
            sf_dir,
            "prometheus_anomaly_detection_lstm_spark_lshq",
            "buckets",
            emb.count(),
            lsh_build_recipe(LSH_RECALL08["planes"], LSH_RECALL08["tables"]),
            lambda p: build_lsh_index(
                emb,
                p,
                planes=LSH_RECALL08["planes"],
                tables=LSH_RECALL08["tables"],
            ),
        )
        return cosine_topk_lsh_prebuilt(
            spark, path, probe_hamming=LSH_RECALL08["probe_hamming"]
        )

    return (q, _lsh_oracle(**LSH_RECALL08))


def _ivf_prebuilt_entry() -> tuple[QueryFn, str | None]:
    """ann_cosine_topk_ivf through the persisted-index path
    (build_ivf_index + cosine_topk_ivf_prebuilt at the IVF_RECALL08
    production config) — same exact oracle as the inline query."""
    from .operators.similarity import (
        IVF_RECALL08,
        _emb,
        _ivf_oracle,
        build_ivf_index,
        cosine_topk_ivf_prebuilt,
        ivf_build_recipe,
    )

    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        emb = _emb(spark, sf_dir)
        path = _ensure_ann_index(
            sf_dir,
            "prometheus_anomaly_detection_lstm_spark_ivfq",
            "assignments",
            emb.count(),
            ivf_build_recipe(IVF_RECALL08["n_lists"]),
            lambda p: build_ivf_index(emb, p, n_lists=IVF_RECALL08["n_lists"]),
        )
        return cosine_topk_ivf_prebuilt(
            spark, path, n_probe=IVF_RECALL08["n_probe"]
        )

    return (q, _ivf_oracle(**IVF_RECALL08))


PYTEST_ONLY_QUERIES: dict[str, tuple[QueryFn, str | None]] = {
    "anomaly_mse_mapinpandas": (q_mse_via_mapinpandas, oracles.ORACLE_ANOMALY_MSE),
    "corpus_bpe_encode_bounded": _bpe_bounded_entry(),
    "ann_cosine_topk_pq_prebuilt": _pq_prebuilt_entry(),
    "ann_cosine_topk_lsh_prebuilt": _lsh_prebuilt_entry(),
    "ann_cosine_topk_ivf_prebuilt": _ivf_prebuilt_entry(),
}

#: Ledger aliases: names that appeared on an official per-round
#: CORRECTNESS artifact and were later renamed or demoted out of the
#: driver registry.  Cumulative "ever graded" tooling must treat a
#: ledger row under the OLD name as covering the NEW name — otherwise
#: the cumulative count double-counts (the round-8 verdict's "269th
#: ghost query").  Maps ledger-name -> current registry name (or
#: PYTEST_ONLY_QUERIES name) that carries the same semantics today.
LEDGER_ALIASES: dict[str, str] = {
    # graded round 1; the mapInPandas physical path was then demoted to
    # PYTEST_ONLY_QUERIES (same ORACLE_ANOMALY_MSE) and the Catalyst
    # path was registered as `anomaly_mse` / `anomaly_mse_lstm`.
    "anomaly_mse_mapinpandas": "anomaly_mse",
}

#: Grading priority.  The driver grades the FIRST 50 registry entries
#: per round (observed in round 1: CORRECTNESS_r01.json stopped at 50
#: of 65), so never-yet-graded and recently-changed queries are ordered
#: first; queries with unchanged semantics and green round-1 rows sit
#: past the window.  Names missing from the merged dict are skipped;
#: merged entries missing from this list append in module order.
PRIORITY: list[str] = [
    # ---- round-13 window (position machine-checked by
    # tests/test_registry_hygiene.py).  Composition per the round-12
    # verdict task 1: (a) the 23 rows whose plans changed in round 12
    # AFTER the r12 oracle window froze — their green official rows
    # predate the change (every one driver-simmed hash-MATCH
    # out-of-repo on arrival and again on this tree); (b) the 2 rows
    # whose plans changed THIS round — events_heavy_hitters (MG
    # candidates+count fold, 3 scans -> 2) and semantic_dedup_scaled
    # (narrow-projection checkpoint, assignment stage computed once) —
    # both hash-MATCH driver-simmed; two MORE (a)-cohort rows changed
    # plans again this round and are already in-window:
    # text_containment_pairs (PPJoin positional filter + shuffle-hash
    # sizes join) and dedup_ngram_jaccard (PPJoin positional + length
    # filters), each equality-guarded at >=2 scales + driver-simmed;
    # (c) 25 stalest-cohort refills by
    # queue order (r7-graded rows, unchanged semantics).
    # 23 + 2 + 25 = 50. ----
    "user_set_ops", "dedup_ngram_jaccard", "dedup_embedding_cosine",
    "event_pagerank", "rolling_features", "mse_histogram",
    "event_graph_triangles", "text_related_docs_topk", "anomaly_mse_lstm",
    "corpus_clean_tokenize_pack", "metric_distribution_drift",
    "text_containment_pairs", "corpus_upsert_latest",
    "dedup_minhash_incremental", "text_nb_classifier",
    "text_nb_classifier_auc", "text_nb_confusion", "metric_seasonal_mad",
    "corpus_source_token_drift", "metric_mad_outliers", "multires_rollup",
    "events_funnel_timing", "promql_absent", "events_heavy_hitters",
    "semantic_dedup_scaled", "rollup_agg", "topk_per_group", "semi_anti_join",
    "running_revenue", "distinct_users", "vocab_stats", "funnel",
    "embedding_mean_by_label", "events_hourly_pivot", "unpivot_metrics",
    "approx_distinct_users", "nan_counts", "tpch_q6", "min_cost_supplier",
    "ffill_bfill", "metrics_wide", "standard_scaled", "scaler_params",
    "calendar_features", "fill_mean", "fill_median", "tail_n", "inner_align",
    "dedup_keep_first", "multi_series_first",
    # ================= past the 50-slot window =================
    # (position enforced by tests/test_registry_hygiene.py)
    # staleness-ordered queue (unchanged relative order), then the 49
    # rows graded in round 12 (CORRECTNESS_r12) displaced from the old
    # window — freshest, last.  The full per-query change notes for the
    # r12 landings live in OPTIMIZATION_r12.md and the r12 window
    # comments (git history of this block).
    "union_periods", "backfill_missing", "numeric_coercion",
    "text_token_counts", "text_lang_id", "text_fingerprints",
    "text_winnowing_fingerprints", "text_pii_redact", "text_quality_scores",
    "multimodal_binary_metadata", "multimodal_decode_stub",
    "multimodal_frame_sample", "corpus_hash_sample", "corpus_doc_chunks",
    "corpus_doc_packing", "corpus_dup_span_removal", "corpus_bpe_encode",
    "corpus_bpe_packing", "per_feature_mse", "asof_join", "dedup_exact",
    "dedup_simhash", "dedup_simhash_pairs", "embedding_norms",
    "text_frequent_tokens", "embedding_random_projection",
    "promql_counter_rate", "promql_gauge_over_time",
    "promql_histogram_quantile", "promql_topk_series",
    "promql_rate_by_labelset", "promql_rate_anomaly", "promql_deriv_predict",
    "metric_correlations", "corpus_clean_pipeline", "minmax_scaled",
    "corpus_stratified_sample", "embedding_covariance", "cube_agg",
    "table_profile", "text_ngram_novelty", "text_dup_ngram_spans",
    "text_lm_trigram_scores", "sessionize", "events_json_extract",
    "retention_cohorts", "user_path_transitions", "metric_trend_slopes",
    "range_join_interval_counts", "tpch_q4", "tpch_q7", "tpch_q8", "tpch_q9",
    "tpch_q10", "tpch_q11", "tpch_q12", "tpch_q13", "tpch_q14", "tpch_q15",
    "tpch_q16", "tpch_q17", "tpch_q18", "tpch_q19", "tpch_q20", "tpch_q21",
    "tpch_q22", "ann_cosine_topk_lsh", "ann_cosine_topk_ivf",
    "corpus_decontaminate", "corpus_shuffle_shards",
    "corpus_token_budget_sample", "embedding_quantize_int8",
    "text_quality_filter", "metric_rolling_median", "metric_change_points",
    "corpus_quality_curriculum", "metric_autocorrelation",
    "metric_stl_decompose", "metric_m4_downsample", "metric_slo_burn_rate",
    "corpus_importance_sample", "metric_anomaly_ensemble",
    "corpus_bloom_decontaminate", "corpus_bpe_encode_32k",
    "text_lang_id_ngram", "text_lang_id_confusion",
    "corpus_perplexity_filter", "corpus_ccnet_partition",
    "text_repetition_scores", "vocab_bpe_merges", "ann_cosine_topk_pq",
    "tpch_q1_incremental", "embedding_nearest_centroid_eval",
    "metric_forecast_backtest", "promql_label_ops", "customer_rfm_segments",
    "events_ab_test", "corpus_length_gini", "metric_cross_correlation",
    "cohort_ltv_curve", "promql_changes_resets", "metric_ewma",
    "corpus_mixture_sample", "promql_subquery_max_rate",
    "promql_alert_episodes", "promql_rate_offset_delta", "promql_sum_by_rate",
    "promql_series_cardinality", "promql_time_weighted_avg",
    "embedding_kmeans", "semantic_dedup", "embedding_pq_codes",
    "metric_seasonal_anomaly", "events_grouping_sets",
    "events_rank_functions", "scd2_user_bands", "metric_resample_interpolate",
    "events_attribution", "events_frequent_paths", "orders_backlog_daily",
    "table_quality_checks", "events_pointintime_features",
    "orders_churn_labels", "promql_vector_match_ratio",
    "events_props_key_profile", "dedup_minhash_lsh", "dedup_clusters",
    "dedup_apply", "corpus_neardup_keep_best", "dedup_minhash_recall_eval",
    "dedup_lsh_bucket_profile", "anomaly_mse", "anomaly_flags",
    "anomaly_intervals", "threshold_percentiles",
    "approx_threshold_percentiles", "embedding_knn_label_audit",
    "ann_cosine_topk", "corpus_zipf_fit", "dedup_edit_distance",
    "embedding_logreg_fit", "embedding_matryoshka_eval",
    "embedding_ridge_fit", "embedding_whiten", "events_bot_cadence",
    "events_dau_wau", "events_markov_next_eval", "metric_cusum_anomalies",
    "metric_periodogram", "metric_theil_sen_trend", "multimodal_phash_dedup",
    "parts_abc_by_brand", "promql_lang_error_ratio",
    "promql_lang_histogram_quantile", "promql_lang_increase_filter",
    "promql_lang_label_replace", "promql_lang_quantile_over_time",
    "promql_lang_rate_sum", "promql_lang_topk_gauge", "return_rate_by_brand",
    "shipping_delay_profile", "supplier_hhi_by_nation", "text_char_entropy",
    "text_readability_scores", "doc_type_token_ratio", "customer_order_gaps",
    "join_key_skew_profile", "embedding_hard_negatives", "metric_sax_symbols",
    "threshold_split", "text_tfidf_top_terms", "text_bm25_topk",
    "text_feature_hashing", "metric_spot_threshold",
    "metric_spot_anomaly_hours", "metric_dspot_threshold",
    "metric_dspot_anomaly_hours", "events_association_rules",
    "orders_basket_affinity", "text_log_odds_keywords",
    "text_pmi_collocations", "promql_lang_predict_linear",
    "promql_lang_changes_sum", "promql_lang_unless_gate",
    "embedding_centroid_drift", "metric_sax_motifs",
    "metric_sax_similar_days", "dedup_hot_shingles",
    "orders_km_reorder_curve", "events_ab_cuped", "events_ab_power",
    "metric_df_stationarity", "metric_matrix_profile",
    "multimodal_audio_features", "metric_spectral_residual",
    "metric_holt_winters", "metric_pca_scores", "tpch_q3_bucketed",
    "promql_holt_smoothing", "metric_ramp_detect", "events_ab_sequential",
    "metric_glr_changepoint", "corpus_dedup_e2e_stats",
    "text_keyword_extract", "metric_esd_outliers", "metric_ar2_residuals",
    "events_anomaly_attribution", "orders_price_elasticity",
    "metric_cointegration_pairs", "embedding_kcenter_coreset",
    "text_burstiness", "events_ab_srm_check", "metric_glr_variance_change",
    "corpus_sample_ngram_coverage", "text_source_overlap_matrix", "tpch_q1",
    "tpch_q3", "tpch_q5", "windowed_events",
]



def all_queries() -> dict[str, tuple[QueryFn, str | None]]:
    from .plans import (
        extended, mining, relational, robust, tpch_more, tpch_wave3, wave5,
        wave8, wave9, wave10, wave11,
    )
    from .operators import (
        approx, bpe, corpus, dedup, kmeans, linalg, matrixprofile,
        profile, promql, promql_lang, similarity, text, multimodal,
    )
    from .ml import lstm_query

    merged: dict[str, tuple[QueryFn, str | None]] = {}
    merged.update(DOMAIN_QUERIES)
    merged.update(relational.QUERIES)
    merged.update(tpch_more.QUERIES)
    merged.update(tpch_wave3.QUERIES)
    merged.update(extended.QUERIES)
    merged.update(mining.QUERIES)
    merged.update(wave5.QUERIES)
    merged.update(robust.QUERIES)
    merged.update(wave8.QUERIES)
    merged.update(wave9.QUERIES)
    merged.update(wave10.QUERIES)
    merged.update(wave11.QUERIES)
    merged.update(approx.QUERIES)
    merged.update(promql.QUERIES)
    merged.update(promql_lang.QUERIES)
    merged.update(matrixprofile.QUERIES)
    merged.update(linalg.QUERIES)
    merged.update(kmeans.QUERIES)
    merged.update(profile.QUERIES)
    merged.update(dedup.QUERIES)
    merged.update(similarity.QUERIES)
    merged.update(text.QUERIES)
    merged.update(multimodal.QUERIES)
    merged.update(corpus.QUERIES)
    merged.update(lstm_query.QUERIES)
    merged.update(bpe.QUERIES)

    out: dict[str, tuple[QueryFn, str | None]] = {}
    for name in PRIORITY:
        if name in merged:
            out[name] = merged.pop(name)
    out.update(merged)  # anything not in PRIORITY keeps module order
    return {n: (_ships(fn), sql) for n, (fn, sql) in out.items()}


def _ships(fn: QueryFn) -> QueryFn:
    """Guarantee the package is importable on executor workers before
    ANY registry query runs (round-12 preflight finding): closures sent
    through applyInPandas/mapInPandas pickle package symbols BY MODULE
    REFERENCE, so a UDF-bearing query run as the FIRST query of an
    out-of-repo driver session raised ModuleNotFoundError on the
    worker — it only ever passed because some earlier query in the
    window had already called shipping.ensure_shipped for the session.
    Wrapping here makes the driver contract order-independent;
    ensure_shipped is memoized per SparkContext (one zip+addPyFile per
    process, then a set lookup)."""

    def q(spark, sf_dir):
        from .shipping import ensure_shipped

        ensure_shipped(spark)
        return fn(spark, sf_dir)

    q.__name__ = getattr(fn, "__name__", "query")
    q.__doc__ = fn.__doc__
    q.__wrapped__ = fn
    return q
